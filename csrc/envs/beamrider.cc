// Beam Rider — from-scratch C++ clone of the lane shooter: the player ship
// slides between 5 beams at the bottom of a perspective grid; white saucers
// descend the beams in sector waves of 15 and must be shot (44 points each,
// like the arcade); colliding with a saucer or letting it reach the player
// row costs a life (3 lives). Clearing a sector speeds the next one up.
// Renders grayscale 84x84. Stands in for EnvPool's ALE BeamRider-v5
// (BASELINE.json config 4).

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kLanes = 5;
constexpr float kPlayerY = 74.0f;
constexpr int kPlayerW = 6, kPlayerH = 4;
constexpr int kSaucerW = 5, kSaucerH = 3;
constexpr float kTopY = 12.0f;
constexpr int kSectorSize = 15;

// Beam x centers: perspective fan rendered as straight columns at the play row.
inline float lane_x(int lane) { return 12.0f + lane * 15.0f; }

struct Saucer {
  bool live = false;
  int lane = 0;
  float y = 0;
  float speed = 0.4f;
};

class BeamRiderGame : public Game {
 public:
  void reset_game(PCG32& rng) override {
    lives_ = 3;
    over_ = false;
    sector_ = 1;
    player_lane_ = 2;
    player_x_ = lane_x(2) - kPlayerW / 2.0f;
    shot_live_ = false;
    begin_sector(rng);
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Lane switching: the ship slides toward the target lane.
    if (a.dx > 0 && player_lane_ < kLanes - 1 && at_target()) ++player_lane_;
    if (a.dx < 0 && player_lane_ > 0 && at_target()) --player_lane_;
    float target = lane_x(player_lane_) - kPlayerW / 2.0f;
    float d = target - player_x_;
    if (std::fabs(d) > 1.5f) player_x_ += d > 0 ? 1.5f : -1.5f;
    else player_x_ = target;

    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_lane_ = player_lane_;
      shot_y_ = kPlayerY - 2;
    }
    if (shot_live_) {
      shot_y_ -= 3.5f;
      for (auto& s : saucers_)
        if (s.live && s.lane == shot_lane_ && shot_y_ <= s.y + kSaucerH && shot_y_ + 3 >= s.y) {
          s.live = false;
          shot_live_ = false;
          reward += 44.0f;
          --sector_remaining_;
          break;
        }
      if (shot_y_ < kTopY) shot_live_ = false;
    }

    // Saucer movement + spawning.
    for (auto& s : saucers_) {
      if (!s.live) continue;
      s.y += s.speed;
      // Occasional lane hop mid-descent (the arcade's weave).
      if ((rng.next_uint32() & 127u) == 0) {
        int hop = (rng.next_uint32() & 1) ? 1 : -1;
        s.lane = s.lane + hop < 0 ? 0 : (s.lane + hop >= kLanes ? kLanes - 1 : s.lane + hop);
      }
      if (s.y + kSaucerH >= kPlayerY) {
        bool same_lane = s.lane == player_lane_ && at_target();
        s.live = false;
        ++to_spawn_;  // escaped saucers re-enter: the sector needs 15 kills
        if (same_lane) {
          if (--lives_ <= 0) over_ = true;
        }
      }
    }
    if (to_spawn_ > 0 && --spawn_clock_ <= 0) {
      spawn(rng);
      spawn_clock_ = spawn_period_;
    }
    if (sector_remaining_ <= 0) {
      ++sector_;
      begin_sector(rng);
      reward += 0.0f;  // sector bonus omitted; kills carry the score
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Perspective grid: converging beam lines + horizon.
    for (int x = 0; x < kScreen; ++x) f[static_cast<int>(kTopY) * kScreen + x] = 60;
    for (int l = 0; l < kLanes; ++l) {
      float bx = lane_x(l);
      float hx = 42.0f + (bx - 42.0f) * 0.25f;  // converge toward center at horizon
      for (int y = static_cast<int>(kTopY); y < 80; ++y) {
        float t = (y - kTopY) / (80.0f - kTopY);
        int x = static_cast<int>(hx + (bx - hx) * t);
        if (x >= 0 && x < kScreen) f[y * kScreen + x] = 50;
      }
    }
    // Lives ticks.
    for (int l = 0; l < lives_; ++l)
      for (int x = 0; x < 3; ++x) f[1 * kScreen + 2 + l * 5 + x] = 120;
    // Sector progress ticks (remaining saucers).
    for (int i = 0; i < sector_remaining_ && i < 15; ++i) f[3 * kScreen + 2 + i * 2] = 90;
    // Saucers (brighter as they approach).
    for (const auto& s : saucers_)
      if (s.live)
        rect(f, lane_x(s.lane) - kSaucerW / 2.0f, s.y, kSaucerW, kSaucerH,
             static_cast<uint8_t>(150 + 100 * (s.y / kPlayerY)));
    // Player + shot.
    rect(f, player_x_, kPlayerY, kPlayerW, kPlayerH, 230);
    if (shot_live_) rect(f, lane_x(shot_lane_), shot_y_, 1, 3, 255);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 9; }
  int minimal_to_full(int a) const override {
    // ALE BeamRider minimal set: NOOP FIRE UP RIGHT LEFT UPRIGHT UPLEFT RIGHTFIRE LEFTFIRE
    static const int map[9] = {0, 1, 2, 3, 4, 6, 7, 11, 12};
    return map[a < 0 || a >= 9 ? 0 : a];
  }

 private:
  static void rect(uint8_t* f, float fx, float fy, int w, int h, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool at_target() const {
    return std::fabs(player_x_ - (lane_x(player_lane_) - kPlayerW / 2.0f)) < 0.75f;
  }

  void begin_sector(PCG32& rng) {
    for (auto& s : saucers_) s.live = false;
    sector_remaining_ = kSectorSize;
    to_spawn_ = kSectorSize;
    spawn_period_ = 34 - 2 * (sector_ < 12 ? sector_ : 12);  // faster sectors
    spawn_clock_ = 10;
    base_speed_ = 0.35f + 0.05f * (sector_ < 10 ? sector_ : 10);
    (void)rng;
  }

  void spawn(PCG32& rng) {
    for (auto& s : saucers_)
      if (!s.live) {
        s.live = true;
        s.lane = static_cast<int>(rng.randint(kLanes));
        s.y = kTopY;
        s.speed = base_speed_ * (0.9f + 0.2f * rng.uniform());
        --to_spawn_;
        return;
      }
  }

  Saucer saucers_[4];
  int lives_ = 3;
  bool over_ = false;
  int sector_ = 1, sector_remaining_ = kSectorSize, to_spawn_ = kSectorSize;
  int spawn_clock_ = 10, spawn_period_ = 30;
  float base_speed_ = 0.4f;
  int player_lane_ = 2;
  float player_x_ = 0;
  bool shot_live_ = false;
  int shot_lane_ = 2;
  float shot_y_ = 0;
};

}  // namespace

std::unique_ptr<Game> make_beamrider_game() { return std::make_unique<BeamRiderGame>(); }

}  // namespace cleanba
