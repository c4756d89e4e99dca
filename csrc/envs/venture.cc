// Venture — from-scratch C++ clone with the classic mechanics: four
// treasure rooms off a hall patrolled by unkillable Hallmonsters; dash into
// a room, shoot the goblins guarding the treasure (+200 on the grab), get
// out, clear all four rooms for the next, faster level.
//
// Stands in for EnvPool's ALE Venture-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave10.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRooms = 4;
// Room rects (x0, y0, w, h), walls 2 px, a 6-px door centered on the
// hall-facing side (right wall for left rooms, left wall for right rooms).
const float kRoomX[kRooms] = {6.0f, 48.0f, 6.0f, 48.0f};
const float kRoomY[kRooms] = {6.0f, 6.0f, 48.0f, 48.0f};
constexpr float kRoomW = 30.0f, kRoomH = 28.0f;
// Reinforcement hallmonsters join from level 1 (round-5 calibration: the
// dwell-budget intruder alone did not bind — a fast looter never lingers —
// so deep levels now flood the hall instead).
constexpr int kHallMon = 4;
constexpr float kHallW = 8.0f, kHallH = 8.0f;
constexpr int kGoblins = 2;  // per room
constexpr float kGobW = 5.0f, kGobH = 5.0f;
constexpr float kPlayerW = 3.0f, kPlayerH = 3.0f;
constexpr float kWalk = 1.0f;
constexpr float kShotV = 2.5f;
constexpr int kLives = 3;

class VentureGame : public Game {
 public:
  void reset_game(PCG32&) override {
    level_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_level();
    respawn();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    // Round-5 calibration: the mild ramp let a trained agent farm ~19
    // dungeon levels (15.7k / 1,324% HNS — 6x Agent57 on the real game).
    // Hallmonsters and goblins now outpace the player within a few levels.
    float hspeed = 0.35f + 0.25f * static_cast<float>(level_);
    float gspeed = 0.5f + 0.3f * static_cast<float>(level_);

    // Player: per-axis movement blocked by room walls.
    float nx = px_ + static_cast<float>(a.dx) * kWalk;
    if (!hits_wall(nx, py_)) px_ = nx;
    float ny = py_ + static_cast<float>(a.dy) * kWalk;
    if (!hits_wall(px_, ny)) py_ = ny;
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > 84.0f - kPlayerW) px_ = 84.0f - kPlayerW;
    if (py_ < 0.0f) py_ = 0.0f;
    if (py_ > 84.0f - kPlayerH) py_ = 84.0f - kPlayerH;
    if (a.dx != 0 || a.dy != 0) {
      face_dx_ = static_cast<float>(a.dx);
      face_dy_ = static_cast<float>(a.dy);
    }

    // Shot (8-direction, works only inside rooms — the hall is no place to
    // fight).
    if (a.fire && !shot_live_ && in_any_room(px_, py_)) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_ + kPlayerH / 2.0f;
      float n = std::fabs(face_dx_) + std::fabs(face_dy_);
      shot_vx_ = face_dx_ / (n > 0 ? n : 1.0f) * kShotV;
      shot_vy_ = face_dy_ / (n > 0 ? n : 1.0f) * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      shot_y_ += shot_vy_;
      if (shot_x_ < 0 || shot_x_ >= 84 || shot_y_ < 0 || shot_y_ >= 84 ||
          wall_px(shot_x_, shot_y_))
        shot_live_ = false;
    }

    // Hallmonsters: diagonal bouncers in the hall band; invincible. Levels
    // add reinforcements (2 at level 0, +1 per level up to 4).
    int active_hm = 2 + level_;
    if (active_hm > kHallMon) active_hm = kHallMon;
    for (int h = 0; h < active_hm; ++h) {
      hm_x_[h] += hm_vx_[h] * hspeed;
      hm_y_[h] += hm_vy_[h] * hspeed;
      if (hm_x_[h] < 0.0f || hm_x_[h] + kHallW > 84.0f) hm_vx_[h] = -hm_vx_[h];
      if (hm_y_[h] < 0.0f || hm_y_[h] + kHallH > 84.0f) hm_vy_[h] = -hm_vy_[h];
      // They stalk the hall: only dangerous when the player is outside rooms.
      if (!in_any_room(px_, py_) &&
          px_ + kPlayerW > hm_x_[h] && px_ < hm_x_[h] + kHallW &&
          py_ + kPlayerH > hm_y_[h] && py_ < hm_y_[h] + kHallH) {
        reward += lose_life();
        return reward;
      }
    }

    // Goblins patrol horizontally inside their room; shootable; touch kills.
    for (int r = 0; r < kRooms; ++r) {
      if (room_done_[r]) continue;
      for (int g = 0; g < kGoblins; ++g) {
        int i = r * kGoblins + g;
        if (!gob_live_[i]) continue;
        gob_x_[i] += gob_dir_[i] * gspeed;
        float lo = kRoomX[r] + 3.0f, hi = kRoomX[r] + kRoomW - 3.0f - kGobW;
        if (gob_x_[i] < lo) { gob_x_[i] = lo; gob_dir_[i] = 1.0f; }
        if (gob_x_[i] > hi) { gob_x_[i] = hi; gob_dir_[i] = -1.0f; }
        if (shot_live_ && shot_x_ >= gob_x_[i] && shot_x_ < gob_x_[i] + kGobW &&
            shot_y_ >= gob_y_[i] && shot_y_ < gob_y_[i] + kGobH) {
          shot_live_ = false;
          gob_live_[i] = false;
          continue;
        }
        if (px_ + kPlayerW > gob_x_[i] && px_ < gob_x_[i] + kGobW &&
            py_ + kPlayerH > gob_y_[i] && py_ < gob_y_[i] + kGobH) {
          reward += lose_life();
          return reward;
        }
      }
      // The treasure.
      float tx = kRoomX[r] + kRoomW / 2.0f - 2.0f;
      float ty = kRoomY[r] + kRoomH / 2.0f - 2.0f;
      if (px_ + kPlayerW > tx && px_ < tx + 4.0f &&
          py_ + kPlayerH > ty && py_ < ty + 4.0f) {
        room_done_[r] = true;
        reward += 200.0f;
        score_ += 200;
      }
    }

    // Hallmonster intrusion (the cabinet's iconic anti-camping rule,
    // round-5 calibration): linger in a room too long and an invincible
    // hallmonster enters through its door, chasing until contact or until
    // the player leaves. The dwell budget shrinks with the level, so deep
    // dungeon loops can no longer be farmed at leisure.
    int cur = -1;
    for (int r = 0; r < kRooms; ++r)
      if (in_room(r, px_, py_)) { cur = r; break; }
    if (cur != last_room_) {
      last_room_ = cur;
      room_timer_ = 0;
      intruder_live_ = false;
    }
    if (cur >= 0) {
      ++room_timer_;
      int limit = 150 - 12 * level_;
      if (limit < 40) limit = 40;
      if (!intruder_live_ && room_timer_ >= limit) {
        intruder_live_ = true;
        in_x_ = (cur % 2 == 0) ? kRoomX[cur] + kRoomW - 2.0f - kHallW
                               : kRoomX[cur] + 2.0f;
        in_y_ = kRoomY[cur] + kRoomH / 2.0f - kHallH / 2.0f;
      }
      if (intruder_live_) {
        float ispeed = hspeed + 0.2f;
        float idx = px_ - in_x_, idy = py_ - in_y_;
        in_x_ += (idx > 0.0f ? 1.0f : (idx < 0.0f ? -1.0f : 0.0f)) * ispeed;
        in_y_ += (idy > 0.0f ? 1.0f : (idy < 0.0f ? -1.0f : 0.0f)) * ispeed;
        if (px_ + kPlayerW > in_x_ && px_ < in_x_ + kHallW &&
            py_ + kPlayerH > in_y_ && py_ < in_y_ + kHallH) {
          reward += lose_life();
          return reward;
        }
      }
    }

    bool all_done = true;
    for (int r = 0; r < kRooms; ++r)
      if (!room_done_[r]) all_done = false;
    if (all_done) {
      ++level_;
      start_level();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Room walls (with doors) — draw wall band, carve interior and door.
    for (int r = 0; r < kRooms; ++r) {
      draw_rect(f, kRoomX[r], kRoomY[r], kRoomW, kRoomH, 90);
      draw_rect(f, kRoomX[r] + 2.0f, kRoomY[r] + 2.0f, kRoomW - 4.0f,
                kRoomH - 4.0f, 20);
      // Door on the hall-facing vertical wall.
      float door_x = (r % 2 == 0) ? kRoomX[r] + kRoomW - 2.0f : kRoomX[r];
      draw_rect(f, door_x, kRoomY[r] + kRoomH / 2.0f - 3.0f, 2.0f, 6.0f, 20);
      if (!room_done_[r]) {
        draw_rect(f, kRoomX[r] + kRoomW / 2.0f - 2.0f,
                  kRoomY[r] + kRoomH / 2.0f - 2.0f, 4.0f, 4.0f, 230);
        for (int g = 0; g < kGoblins; ++g) {
          int i = r * kGoblins + g;
          if (gob_live_[i]) draw_rect(f, gob_x_[i], gob_y_[i], kGobW, kGobH, 150);
        }
      }
    }
    int active_hm = 2 + level_;
    if (active_hm > kHallMon) active_hm = kHallMon;
    for (int h = 0; h < active_hm; ++h)
      draw_rect(f, hm_x_[h], hm_y_[h], kHallW, kHallH, 180);
    if (intruder_live_) draw_rect(f, in_x_, in_y_, kHallW, kHallH, 180);
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 200 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 44 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static bool in_room(int r, float x, float y) {
    return x >= kRoomX[r] + 2.0f && x + kPlayerW <= kRoomX[r] + kRoomW - 2.0f &&
           y >= kRoomY[r] + 2.0f && y + kPlayerH <= kRoomY[r] + kRoomH - 2.0f;
  }

  static bool in_any_room(float x, float y) {
    for (int r = 0; r < kRooms; ++r)
      if (in_room(r, x, y)) return true;
    return false;
  }

  // Wall test for the player box: inside the 2-px wall band of any room,
  // except the 6-px door gap on the hall-facing side.
  bool hits_wall(float fx, float fy) const {
    for (int dy = 0; dy < static_cast<int>(kPlayerH); ++dy)
      for (int dx = 0; dx < static_cast<int>(kPlayerW); ++dx)
        if (wall_px(fx + static_cast<float>(dx), fy + static_cast<float>(dy)))
          return true;
    return false;
  }

  bool wall_px(float fx, float fy) const {
    for (int r = 0; r < kRooms; ++r) {
      bool in_outer = fx >= kRoomX[r] && fx < kRoomX[r] + kRoomW &&
                      fy >= kRoomY[r] && fy < kRoomY[r] + kRoomH;
      if (!in_outer) continue;
      bool in_inner = fx >= kRoomX[r] + 2.0f && fx < kRoomX[r] + kRoomW - 2.0f &&
                      fy >= kRoomY[r] + 2.0f && fy < kRoomY[r] + kRoomH - 2.0f;
      if (in_inner) return false;
      // Door gap.
      float door_x0 = (r % 2 == 0) ? kRoomX[r] + kRoomW - 2.0f : kRoomX[r];
      if (fx >= door_x0 && fx < door_x0 + 2.0f &&
          fy >= kRoomY[r] + kRoomH / 2.0f - 3.0f &&
          fy < kRoomY[r] + kRoomH / 2.0f + 3.0f)
        return false;
      return true;
    }
    return false;
  }

  int last_room_ = -1;
  int room_timer_ = 0;
  bool intruder_live_ = false;
  float in_x_ = 0.0f, in_y_ = 0.0f;

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    respawn();
    return 0.0f;
  }

  void respawn() {
    px_ = 41.0f;
    py_ = 41.0f;
    face_dx_ = 0.0f;
    face_dy_ = -1.0f;
    shot_live_ = false;
    last_room_ = -1;
    room_timer_ = 0;
    intruder_live_ = false;
  }

  void start_level() {
    for (int r = 0; r < kRooms; ++r) {
      room_done_[r] = false;
      for (int g = 0; g < kGoblins; ++g) {
        int i = r * kGoblins + g;
        gob_live_[i] = true;
        gob_x_[i] = kRoomX[r] + 4.0f + static_cast<float>(g) * 14.0f;
        gob_y_[i] = kRoomY[r] + 5.0f + static_cast<float>(g) * 12.0f;
        gob_dir_[i] = g % 2 == 0 ? 1.0f : -1.0f;
      }
    }
    hm_x_[0] = 38.0f;
    hm_y_[0] = 2.0f;
    hm_vx_[0] = 1.0f;
    hm_vy_[0] = 1.0f;
    hm_x_[1] = 38.0f;
    hm_y_[1] = 74.0f;
    hm_vx_[1] = -1.0f;
    hm_vy_[1] = -1.0f;
    hm_x_[2] = 2.0f;
    hm_y_[2] = 38.0f;
    hm_vx_[2] = 1.0f;
    hm_vy_[2] = -1.0f;
    hm_x_[3] = 74.0f;
    hm_y_[3] = 38.0f;
    hm_vx_[3] = -1.0f;
    hm_vy_[3] = 1.0f;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 41.0f, py_ = 41.0f, face_dx_ = 0.0f, face_dy_ = -1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0, shot_vy_ = 0;
  float hm_x_[kHallMon] = {}, hm_y_[kHallMon] = {};
  float hm_vx_[kHallMon] = {}, hm_vy_[kHallMon] = {};
  bool gob_live_[kRooms * kGoblins] = {};
  float gob_x_[kRooms * kGoblins] = {}, gob_y_[kRooms * kGoblins] = {};
  float gob_dir_[kRooms * kGoblins] = {};
  bool room_done_[kRooms] = {};
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_venture_game() { return std::make_unique<VentureGame>(); }

}  // namespace cleanba
