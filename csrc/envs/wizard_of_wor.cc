// Wizard of Wor — from-scratch C++ clone with the classic mechanics: a
// corridor dungeon patrolled by six Worlings worth +100 each; they phase in
// and out of visibility, fire down the corridors, and a cleared dungeon
// brings a faster one. Walls block movement (they are not electrified —
// that's Berzerk).
//
// Stands in for EnvPool's ALE WizardOfWor-v5 in the reference's benchmark
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

constexpr int kMonsters = 6;
// Spawn clear of every baffle (box w5 h5 vs build_walls above).
const float kMonX0[kMonsters] = {8.0f, 38.0f, 68.0f, 18.0f, 38.0f, 62.0f};
const float kMonY0[kMonsters] = {5.0f, 5.0f, 5.0f, 45.0f, 45.0f, 45.0f};
const int kMonD0[kMonsters] = {1, 3, 1, 3, 1, 3};  // 0 up 1 right 2 down 3 left
constexpr float kMonW = 5.0f, kMonH = 5.0f;
constexpr float kPlayerW = 5.0f, kPlayerH = 5.0f;
constexpr float kWalk = 0.9f;
constexpr float kShotV = 2.5f;
constexpr float kMShotV = 2.0f;
constexpr int kLives = 3;
constexpr float kSpawnX = 39.0f, kSpawnY = 74.0f;
const int kDirDx[4] = {0, 1, 0, -1};
const int kDirDy[4] = {-1, 0, 1, 0};

// Dungeon wall-pixel mask: border plus a fixed lattice of interior baffles.
void build_walls(uint8_t* w) {
  std::memset(w, 0, kScreenPx);
  auto fill = [&](int x0, int x1, int y0, int y1) {
    for (int y = y0; y < y1; ++y)
      for (int x = x0; x < x1; ++x) w[y * kScreen + x] = 1;
  };
  fill(0, 84, 0, 2);
  fill(0, 84, 82, 84);
  fill(0, 2, 0, 84);
  fill(82, 84, 0, 84);
  // Interior baffles (leave >=8 px corridors everywhere).
  fill(12, 14, 12, 32);
  fill(70, 72, 12, 32);
  fill(12, 14, 52, 72);
  fill(70, 72, 52, 72);
  fill(24, 60, 22, 24);
  fill(24, 60, 60, 62);
  fill(30, 32, 34, 50);
  fill(52, 54, 34, 50);
  fill(40, 44, 40, 42);
}

class WizardOfWorGame : public Game {
 public:
  void reset_game(PCG32&) override {
    build_walls(walls_);
    dungeon_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_dungeon();
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;
    float mspeed = 0.5f + 0.1f * static_cast<float>(dungeon_);

    // Player: axis-independent moves, blocked by walls.
    float nx = px_ + static_cast<float>(a.dx) * kWalk;
    if (!box_hits_wall(nx, py_, kPlayerW, kPlayerH)) px_ = nx;
    float ny = py_ + static_cast<float>(a.dy) * kWalk;
    if (!box_hits_wall(px_, ny, kPlayerW, kPlayerH)) py_ = ny;
    if (a.dx != 0 || a.dy != 0) {
      face_dx_ = static_cast<float>(a.dx);
      face_dy_ = static_cast<float>(a.dy);
    }

    // Player shot.
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

    // Monsters roam the corridors.
    int alive = 0;
    for (int m = 0; m < kMonsters; ++m) {
      if (!mon_alive_[m]) continue;
      ++alive;
      float mx = mx_[m] + static_cast<float>(kDirDx[mdir_[m]]) * mspeed;
      float my = my_[m] + static_cast<float>(kDirDy[mdir_[m]]) * mspeed;
      bool blocked = box_hits_wall(mx, my, kMonW, kMonH);
      bool rethink = blocked || rng.uniform() < 0.02f;
      if (rethink) {
        // Half the time chase the player along the dominant axis, else
        // pick a random heading; fall back to any unblocked one.
        int want;
        if (rng.uniform() < 0.5f) {
          float dx = px_ - mx_[m], dy = py_ - my_[m];
          want = std::fabs(dx) >= std::fabs(dy) ? (dx > 0 ? 1 : 3)
                                                : (dy > 0 ? 2 : 0);
        } else {
          want = static_cast<int>(rng.randint(4));
        }
        for (int k = 0; k < 4; ++k) {
          int d = (want + k) & 3;
          float tx = mx_[m] + static_cast<float>(kDirDx[d]) * mspeed;
          float ty = my_[m] + static_cast<float>(kDirDy[d]) * mspeed;
          if (!box_hits_wall(tx, ty, kMonW, kMonH)) {
            mdir_[m] = d;
            mx_[m] = tx;
            my_[m] = ty;
            break;
          }
        }
      } else {
        mx_[m] = mx;
        my_[m] = my;
      }

      // Monster fires down its corridor when aligned with the player.
      if (!mshot_live_[m] &&
          (std::fabs(mx_[m] - px_) < 3.0f || std::fabs(my_[m] - py_) < 3.0f) &&
          rng.uniform() < 0.012f) {
        mshot_live_[m] = true;
        mshot_x_[m] = mx_[m] + kMonW / 2.0f;
        mshot_y_[m] = my_[m] + kMonH / 2.0f;
        float dx = px_ - mx_[m], dy = py_ - my_[m];
        if (std::fabs(dx) >= std::fabs(dy)) {
          mshot_vx_[m] = (dx > 0 ? 1.0f : -1.0f) * kMShotV;
          mshot_vy_[m] = 0.0f;
        } else {
          mshot_vx_[m] = 0.0f;
          mshot_vy_[m] = (dy > 0 ? 1.0f : -1.0f) * kMShotV;
        }
      }
      // Shot a monster: +100.
      if (shot_live_ && shot_x_ >= mx_[m] && shot_x_ < mx_[m] + kMonW &&
          shot_y_ >= my_[m] && shot_y_ < my_[m] + kMonH) {
        shot_live_ = false;
        mon_alive_[m] = false;
        reward += 100.0f;
        score_ += 100;
        --alive;
        continue;
      }
      // Contact kills.
      if (px_ + kPlayerW > mx_[m] && px_ < mx_[m] + kMonW &&
          py_ + kPlayerH > my_[m] && py_ < my_[m] + kMonH) {
        reward += lose_life();
        return reward;
      }
    }

    // Monster shots fly.
    for (int m = 0; m < kMonsters; ++m) {
      if (!mshot_live_[m]) continue;
      mshot_x_[m] += mshot_vx_[m];
      mshot_y_[m] += mshot_vy_[m];
      if (mshot_x_[m] < 0 || mshot_x_[m] >= 84 || mshot_y_[m] < 0 ||
          mshot_y_[m] >= 84 ||
          walls_[static_cast<int>(mshot_y_[m]) * kScreen +
                 static_cast<int>(mshot_x_[m])]) {
        mshot_live_[m] = false;
        continue;
      }
      if (px_ + kPlayerW > mshot_x_[m] - 1.0f && px_ < mshot_x_[m] + 1.0f &&
          py_ + kPlayerH > mshot_y_[m] - 1.0f && py_ < mshot_y_[m] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }

    // Dungeon cleared.
    if (alive == 0) {
      ++dungeon_;
      start_dungeon();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int i = 0; i < kScreenPx; ++i)
      if (walls_[i]) f[i] = 110;
    for (int m = 0; m < kMonsters; ++m) {
      // Worlings phase out for a third of each cycle.
      bool visible = ((frame_ + m * 13) % 60) < 40;
      if (mon_alive_[m] && visible)
        draw_rect(f, mx_[m], my_[m], kMonW, kMonH, 170);
      if (mshot_live_[m])
        draw_rect(f, mshot_x_[m] - 1.0f, mshot_y_[m] - 1.0f, 2.0f, 2.0f, 210);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
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
    respawn();  // monsters keep hunting where they are
    return 0.0f;
  }

  void respawn() {
    px_ = kSpawnX;
    py_ = kSpawnY;
    face_dx_ = 0.0f;
    face_dy_ = -1.0f;
    shot_live_ = false;
    for (int m = 0; m < kMonsters; ++m) mshot_live_[m] = false;
  }

  void start_dungeon() {
    frame_ = 0;
    for (int m = 0; m < kMonsters; ++m) {
      mon_alive_[m] = true;
      mx_[m] = kMonX0[m];
      my_[m] = kMonY0[m];
      mdir_[m] = kMonD0[m];
      mshot_live_[m] = false;
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
  float mx_[kMonsters] = {}, my_[kMonsters] = {};
  int mdir_[kMonsters] = {};
  bool mon_alive_[kMonsters] = {};
  bool mshot_live_[kMonsters] = {};
  float mshot_x_[kMonsters] = {}, mshot_y_[kMonsters] = {};
  float mshot_vx_[kMonsters] = {}, mshot_vy_[kMonsters] = {};
  int frame_ = 0;
  int dungeon_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_wizard_of_wor_game() {
  return std::make_unique<WizardOfWorGame>();
}

}  // namespace cleanba
