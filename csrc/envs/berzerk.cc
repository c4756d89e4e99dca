// Berzerk — from-scratch C++ clone with the classic mechanics: electrified
// maze walls (touch = death), five robots per room worth +50 each (they
// also die walking into walls), a +10/robot sweep bonus when exiting a
// cleared room, and the indestructible Evil Otto who appears if you linger.
//
// Stands in for EnvPool's ALE Berzerk-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9c.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRobots = 5;
const float kRobotX0[kRobots] = {8.0f, 70.0f, 8.0f, 70.0f, 30.0f};
const float kRobotY0[kRobots] = {8.0f, 8.0f, 70.0f, 70.0f, 20.0f};
constexpr float kRobotW = 4.0f, kRobotH = 6.0f;
constexpr float kRobotSpeed = 0.4f;
constexpr float kPlayerW = 4.0f, kPlayerH = 6.0f;
constexpr float kWalk = 0.8f;
constexpr float kShotV = 2.5f;
constexpr float kRShotV = 1.5f;
constexpr int kOttoFrames = 1200;
constexpr float kOttoSpeed = 0.6f;
constexpr int kLives = 3;
constexpr float kSpawnX = 40.0f, kSpawnY = 72.0f;

// Build the wall-pixel mask for a room variant (border with 4 exit gaps +
// variant-specific interior segments).
void build_walls(int variant, uint8_t* w) {
  std::memset(w, 0, kScreenPx);
  auto fill = [&](int x0, int x1, int y0, int y1) {
    for (int y = y0; y < y1; ++y)
      for (int x = x0; x < x1; ++x) w[y * kScreen + x] = 1;
  };
  // Border, 2 px thick, with gaps [38,46) mid-side.
  fill(0, 84, 0, 2);
  fill(0, 84, 82, 84);
  fill(0, 2, 0, 84);
  fill(82, 84, 0, 84);
  auto gap = [&](int x0, int x1, int y0, int y1) {
    for (int y = y0; y < y1; ++y)
      for (int x = x0; x < x1; ++x) w[y * kScreen + x] = 0;
  };
  gap(38, 46, 0, 2);
  gap(38, 46, 82, 84);
  gap(0, 2, 38, 46);
  gap(82, 84, 38, 46);
  switch (variant & 3) {
    case 0:
      fill(20, 22, 20, 64);
      fill(62, 64, 20, 64);
      break;
    case 1:
      fill(10, 74, 30, 32);
      fill(10, 74, 52, 54);
      break;
    case 2:
      fill(41, 43, 10, 36);
      fill(41, 43, 48, 66);  // ends above the spawn point (40,72)
      break;
    default:
      fill(10, 34, 41, 43);
      fill(50, 74, 41, 43);
      break;
  }
}

class BerzerkGame : public Game {
 public:
  void reset_game(PCG32&) override {
    room_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    enter_room();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;

    // Player moves; remember facing for the shot.
    px_ += static_cast<float>(a.dx) * kWalk;
    py_ += static_cast<float>(a.dy) * kWalk;
    if (a.dx != 0 || a.dy != 0) {
      face_dx_ = static_cast<float>(a.dx);
      face_dy_ = static_cast<float>(a.dy);
    }

    // Through an exit gap? Next room (sweep bonus if all robots are dead).
    // Center-crossing test: a non-gap approach dies on the wall (below)
    // frames before the center could reach the border line.
    float cx = px_ + kPlayerW / 2.0f, cy = py_ + kPlayerH / 2.0f;
    if (cx < 2.0f || cx > 82.0f || cy < 2.0f || cy > 82.0f) {
      bool swept = true;
      for (int r = 0; r < kRobots; ++r)
        if (robot_alive_[r]) swept = false;
      if (swept) {
        reward += 10.0f * kRobots;
        score_ += 10 * kRobots;
      }
      ++room_;
      enter_room();
      return reward;
    }
    // Electrified walls.
    if (box_hits_wall(px_, py_, kPlayerW, kPlayerH)) {
      reward += lose_life();
      return reward;
    }

    // Player shot (one slot; 8-direction, last facing).
    if (a.fire && !shot_live_) {
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
          walls_[static_cast<int>(shot_y_) * kScreen + static_cast<int>(shot_x_)])
        shot_live_ = false;
    }

    // Robots: every other frame, step along the dominant axis toward the
    // player; walking into a wall is fatal (+50).
    int alive = 0;
    for (int r = 0; r < kRobots; ++r) {
      if (!robot_alive_[r]) continue;
      ++alive;
      if (frame_ % 2 == 0) {
        float dx = px_ - rx_[r], dy = py_ - ry_[r];
        float nx = rx_[r], ny = ry_[r];
        if (std::fabs(dx) >= std::fabs(dy))
          nx += (dx > 0 ? 1.0f : -1.0f) * kRobotSpeed * 2.0f;
        else
          ny += (dy > 0 ? 1.0f : -1.0f) * kRobotSpeed * 2.0f;
        if (box_hits_wall(nx, ny, kRobotW, kRobotH)) {
          robot_alive_[r] = false;
          reward += 50.0f;
          score_ += 50;
          --alive;
          continue;
        }
        rx_[r] = nx;
        ry_[r] = ny;
      }
      // Robot fires when roughly aligned.
      if (!rshot_live_[r] &&
          (std::fabs(rx_[r] - px_) < 3.0f || std::fabs(ry_[r] - py_) < 3.0f) &&
          rng.uniform() < 0.01f) {
        rshot_live_[r] = true;
        rshot_x_[r] = rx_[r] + kRobotW / 2.0f;
        rshot_y_[r] = ry_[r] + kRobotH / 2.0f;
        float dx = px_ - rx_[r], dy = py_ - ry_[r];
        if (std::fabs(dx) >= std::fabs(dy)) {
          rshot_vx_[r] = (dx > 0 ? 1.0f : -1.0f) * kRShotV;
          rshot_vy_[r] = 0.0f;
        } else {
          rshot_vx_[r] = 0.0f;
          rshot_vy_[r] = (dy > 0 ? 1.0f : -1.0f) * kRShotV;
        }
      }
      // Player shot hit?
      if (shot_live_ && shot_x_ >= rx_[r] && shot_x_ < rx_[r] + kRobotW &&
          shot_y_ >= ry_[r] && shot_y_ < ry_[r] + kRobotH) {
        shot_live_ = false;
        robot_alive_[r] = false;
        reward += 50.0f;
        score_ += 50;
        --alive;
        continue;
      }
      // Robot touch.
      if (px_ + kPlayerW > rx_[r] && px_ < rx_[r] + kRobotW &&
          py_ + kPlayerH > ry_[r] && py_ < ry_[r] + kRobotH) {
        reward += lose_life();
        return reward;
      }
    }

    // Robot shots fly.
    for (int r = 0; r < kRobots; ++r) {
      if (!rshot_live_[r]) continue;
      rshot_x_[r] += rshot_vx_[r];
      rshot_y_[r] += rshot_vy_[r];
      if (rshot_x_[r] < 0 || rshot_x_[r] >= 84 || rshot_y_[r] < 0 ||
          rshot_y_[r] >= 84 ||
          walls_[static_cast<int>(rshot_y_[r]) * kScreen +
                 static_cast<int>(rshot_x_[r])]) {
        rshot_live_[r] = false;
        continue;
      }
      if (px_ + kPlayerW > rshot_x_[r] - 1.0f && px_ < rshot_x_[r] + 1.0f &&
          py_ + kPlayerH > rshot_y_[r] - 1.0f && py_ < rshot_y_[r] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }

    // Evil Otto: appears after lingering; walks through walls.
    if (frame_ >= kOttoFrames) {
      float dx = px_ - otto_x_, dy = py_ - otto_y_;
      float n = std::fabs(dx) + std::fabs(dy);
      if (n > 0.1f) {
        otto_x_ += dx / n * kOttoSpeed;
        otto_y_ += dy / n * kOttoSpeed;
      }
      if (px_ + kPlayerW > otto_x_ && px_ < otto_x_ + 4.0f &&
          py_ + kPlayerH > otto_y_ && py_ < otto_y_ + 4.0f) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int i = 0; i < kScreenPx; ++i)
      if (walls_[i]) f[i] = 110;
    for (int r = 0; r < kRobots; ++r) {
      if (robot_alive_[r])
        draw_rect(f, rx_[r], ry_[r], kRobotW, kRobotH, 170);
      if (rshot_live_[r])
        draw_rect(f, rshot_x_[r] - 1.0f, rshot_y_[r] - 1.0f, 2.0f, 2.0f, 210);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    if (frame_ >= kOttoFrames) draw_rect(f, otto_x_, otto_y_, 4.0f, 4.0f, 240);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 50 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[83 * kScreen + 36 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  bool box_hits_wall(float fx, float fy, float fw, float fh) const {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        if (walls_[y * kScreen + x]) return true;
    return false;
  }

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    enter_room();  // death re-arms the room (fresh robots, Otto reset)
    return 0.0f;
  }

  void enter_room() {
    build_walls(room_, walls_);
    px_ = kSpawnX;
    py_ = kSpawnY;
    face_dx_ = 0.0f;
    face_dy_ = -1.0f;
    shot_live_ = false;
    frame_ = 0;
    otto_x_ = 2.0f;
    otto_y_ = 2.0f;
    for (int r = 0; r < kRobots; ++r) {
      robot_alive_[r] = true;
      rx_[r] = kRobotX0[r];
      ry_[r] = kRobotY0[r];
      rshot_live_[r] = false;
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  uint8_t walls_[kScreenPx] = {};
  float px_ = kSpawnX, py_ = kSpawnY;
  float face_dx_ = 0.0f, face_dy_ = -1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0, shot_vy_ = 0;
  float rx_[kRobots] = {}, ry_[kRobots] = {};
  bool robot_alive_[kRobots] = {};
  bool rshot_live_[kRobots] = {};
  float rshot_x_[kRobots] = {}, rshot_y_[kRobots] = {};
  float rshot_vx_[kRobots] = {}, rshot_vy_[kRobots] = {};
  float otto_x_ = 2.0f, otto_y_ = 2.0f;
  int frame_ = 0;
  int room_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_berzerk_game() { return std::make_unique<BerzerkGame>(); }

}  // namespace cleanba
