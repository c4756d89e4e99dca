// Q*bert — from-scratch C++ clone of the classic pyramid hopper: color all
// 21 cubes (+25 per first visit, +100 round bonus), dodge the bouncing ball,
// falling off the pyramid costs a life, 3 lives.
//
// Stands in for EnvPool's ALE Qbert-v5 (reference make_env,
// cleanba/cleanba_ppo.py:126-146). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_extra.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 6;  // row r has r+1 cubes; 21 total
constexpr int kHopFrames = 8;   // player hop animation length (raw frames)
constexpr int kBallHop = 10;    // ball hops every N raw frames
constexpr int kCubeW = 10, kCubeFace = 4, kCubeBody = 3;

// Cube (r, c) top-face top-left corner.
inline int cube_x(int r, int c) { return 41 + (2 * c - r) * 7 - kCubeW / 2; }
inline int cube_y(int r) { return 14 + r * 9; }

class QbertGame : public Game {
 public:
  void reset_game(PCG32&) override {
    std::memset(visited_, 0, sizeof(visited_));
    lives_ = 3;
    over_ = false;
    round_ = 0;
    pr_ = pc_ = 0;
    hop_timer_ = 0;
    tr_ = tc_ = 0;
    ball_live_ = false;
    ball_timer_ = 0;
    ball_spawn_ = 90;  // deterministic first spawn (reset parity)
    visited_[0][0] = true;  // the start cube counts as visited (no reward)
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player hop: sample input when idle; land after kHopFrames.
    if (hop_timer_ > 0) {
      if (--hop_timer_ == 0) {
        pr_ = tr_;
        pc_ = tc_;
        if (pr_ < 0 || pr_ >= kRows || pc_ < 0 || pc_ > pr_) {
          // Hopped off the pyramid.
          reward += lose_life();
          return reward;
        }
        if (!visited_[pr_][pc_]) {
          visited_[pr_][pc_] = true;
          reward += 25.0f;
          if (all_visited()) {
            reward += 100.0f;
            std::memset(visited_, 0, sizeof(visited_));
            visited_[pr_][pc_] = true;
            ++round_;
            ball_live_ = false;
            ball_spawn_ = 90 > 30 + 10 * round_ ? 90 - 10 * round_ : 30;
          }
        }
      }
    } else {
      // Joystick -> diagonal hop (classic Q*bert mapping): UP = up-right,
      // DOWN = down-left, RIGHT = down-right, LEFT = up-left.
      int dr = 0, dc = 0;
      bool move = false;
      if (a.dy < 0 && a.dx >= 0) { dr = -1; dc = 0; move = true; }        // UP / UPRIGHT
      else if (a.dy > 0 && a.dx <= 0) { dr = 1; dc = 0; move = true; }    // DOWN / DOWNLEFT
      else if (a.dx > 0) { dr = 1; dc = 1; move = true; }                 // RIGHT / DOWNRIGHT
      else if (a.dx < 0) { dr = -1; dc = -1; move = true; }               // LEFT / UPLEFT
      if (move) {
        tr_ = pr_ + dr;
        tc_ = pc_ + dc;
        hop_timer_ = kHopFrames;
      }
    }

    // Ball: spawn near the top, hop down a random diagonal, fall off the
    // bottom row.
    if (!ball_live_) {
      if (--ball_spawn_ <= 0) {
        ball_live_ = true;
        br_ = 1;
        bc_ = static_cast<int>(rng.randint(2));
        ball_timer_ = kBallHop;
      }
    } else {
      if (--ball_timer_ <= 0) {
        ball_timer_ = kBallHop;
        br_ += 1;
        bc_ += static_cast<int>(rng.randint(2));
        if (br_ >= kRows) {
          ball_live_ = false;
          ball_spawn_ = 60 + static_cast<int>(rng.randint(60));
        }
      }
    }
    // Collision: ball on the player's cube while the player is grounded.
    if (ball_live_ && hop_timer_ == 0 && br_ == pr_ && bc_ == pc_) {
      reward += lose_life();
      return reward;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Cubes: bright face when visited, body shading below.
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c <= r; ++c) {
        int x = cube_x(r, c), y = cube_y(r);
        uint8_t face = visited_[r][c] ? 190 : 90;
        for (int yy = y; yy < y + kCubeFace; ++yy)
          for (int xx = x; xx < x + kCubeW; ++xx) put(f, xx, yy, face);
        for (int yy = y + kCubeFace; yy < y + kCubeFace + kCubeBody; ++yy)
          for (int xx = x + 1; xx < x + kCubeW - 1; ++xx) put(f, xx, yy, 50);
      }
    // Lives ticks.
    for (int l = 0; l < lives_; ++l)
      for (int k = 0; k < 3; ++k) put(f, 2 + l * 5 + k, 1, 255);
    // Ball (drawn under the player).
    if (ball_live_) {
      int x = cube_x(br_, bc_) + kCubeW / 2 - 1, y = cube_y(br_) - 5;
      for (int yy = y; yy < y + 3; ++yy)
        for (int xx = x; xx < x + 3; ++xx) put(f, xx, yy, 140);
    }
    // Player: above its cube, lifted while hopping.
    {
      int r = hop_timer_ > 0 ? tr_ : pr_, c = hop_timer_ > 0 ? tc_ : pc_;
      // Clamp for the fall-off frame (target may be off-pyramid).
      int rr = r < 0 ? 0 : (r >= kRows ? kRows - 1 : r);
      int cc = c < 0 ? 0 : (c > rr ? rr : c);
      int lift = hop_timer_ > 0 ? 3 : 0;
      int x = cube_x(rr, cc) + kCubeW / 2 - 2, y = cube_y(rr) - 6 - lift;
      for (int yy = y; yy < y + 5; ++yy)
        for (int xx = x; xx < x + 4; ++xx) put(f, xx, yy, 230);
    }
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    static const int map[6] = {0, 1, 2, 3, 4, 5};  // NOOP FIRE UP RIGHT LEFT DOWN
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  static void put(uint8_t* f, int x, int y, uint8_t v) {
    if (x >= 0 && x < kScreen && y >= 0 && y < kScreen) f[y * kScreen + x] = v;
  }

  bool all_visited() const {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c <= r; ++c)
        if (!visited_[r][c]) return false;
    return true;
  }

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    pr_ = pc_ = 0;
    hop_timer_ = 0;
    ball_live_ = false;
    ball_spawn_ = 90;
    return 0.0f;
  }

  bool visited_[kRows][kRows] = {};
  int lives_ = 3;
  bool over_ = false;
  int round_ = 0;
  int pr_ = 0, pc_ = 0;       // player cube
  int tr_ = 0, tc_ = 0;       // hop target
  int hop_timer_ = 0;
  bool ball_live_ = false;
  int br_ = 0, bc_ = 0;
  int ball_timer_ = 0, ball_spawn_ = 90;
};

}  // namespace

std::unique_ptr<Game> make_qbert_game() { return std::make_unique<QbertGame>(); }

}  // namespace cleanba
