// Task registry: maps EnvPool-style task ids to engine environments.

#include <string>

#include "atari_like.h"
#include "procgen_like.h"
#include "env.h"

namespace cleanba {

std::unique_ptr<Env> make_cartpole_env(const EnvOptions& opts);
std::unique_ptr<Game> make_breakout_game();
std::unique_ptr<Game> make_pong_game();
std::unique_ptr<Game> make_space_invaders_game();
std::unique_ptr<Game> make_beamrider_game();
std::unique_ptr<Game> make_freeway_game();
std::unique_ptr<Game> make_boxing_game();
std::unique_ptr<Game> make_seaquest_game();
std::unique_ptr<Game> make_qbert_game();
std::unique_ptr<Game> make_asterix_game();
std::unique_ptr<Game> make_mspacman_game();
std::unique_ptr<Game> make_demon_attack_game();
std::unique_ptr<Game> make_enduro_game();
std::unique_ptr<Game> make_atlantis_game();
std::unique_ptr<Game> make_bowling_game();
std::unique_ptr<Game> make_fishing_derby_game();
std::unique_ptr<Game> make_crazy_climber_game();
std::unique_ptr<Game> make_assault_game();
std::unique_ptr<Game> make_phoenix_game();
std::unique_ptr<Game> make_gopher_game();
std::unique_ptr<Game> make_name_this_game_game();
std::unique_ptr<Game> make_riverraid_game();
std::unique_ptr<Game> make_kung_fu_master_game();
std::unique_ptr<Game> make_tennis_game();
std::unique_ptr<Game> make_star_gunner_game();
std::unique_ptr<Game> make_amidar_game();
std::unique_ptr<Game> make_bank_heist_game();
std::unique_ptr<Game> make_up_n_down_game();
std::unique_ptr<Game> make_time_pilot_game();
std::unique_ptr<Game> make_alien_game();
std::unique_ptr<Game> make_road_runner_game();
std::unique_ptr<Game> make_skiing_game();
std::unique_ptr<Game> make_frostbite_game();
std::unique_ptr<Game> make_kangaroo_game();
std::unique_ptr<Game> make_chopper_command_game();
std::unique_ptr<Game> make_jamesbond_game();
std::unique_ptr<Game> make_zaxxon_game();
std::unique_ptr<Game> make_berzerk_game();
std::unique_ptr<Game> make_wizard_of_wor_game();
std::unique_ptr<Game> make_asteroids_game();
std::unique_ptr<Game> make_centipede_game();
std::unique_ptr<Game> make_tutankham_game();
std::unique_ptr<Game> make_venture_game();
std::unique_ptr<Game> make_ice_hockey_game();
std::unique_ptr<Game> make_battlezone_game();
std::unique_ptr<Game> make_surround_game();
std::unique_ptr<Game> make_defender_game();
std::unique_ptr<Game> make_robotank_game();
std::unique_ptr<Game> make_gravitar_game();
std::unique_ptr<Game> make_double_dunk_game();
std::unique_ptr<Game> make_hero_game();
std::unique_ptr<Game> make_yars_revenge_game();
std::unique_ptr<Game> make_krull_game();
std::unique_ptr<Game> make_montezuma_game();
std::unique_ptr<Game> make_pitfall_game();
std::unique_ptr<Game> make_private_eye_game();
std::unique_ptr<Game> make_solaris_game();
std::unique_ptr<Game> make_video_pinball_game();
std::unique_ptr<Env> make_bigfish_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_maze_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_leaper_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_chaser_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_starpilot_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_fruitbot_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_coinrun_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_miner_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_heist_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_jumper_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_ninja_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_plunder_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_caveflyer_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_climber_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_dodgeball_env(const EnvOptions& opts, bool hard);
std::unique_ptr<Env> make_bossfight_env(const EnvOptions& opts, bool hard);

namespace {

std::unique_ptr<Game> make_game(const std::string& task) {
  if (task == "Breakout-v5") return make_breakout_game();
  if (task == "Pong-v5") return make_pong_game();
  if (task == "SpaceInvaders-v5") return make_space_invaders_game();
  if (task == "BeamRider-v5") return make_beamrider_game();
  if (task == "Freeway-v5") return make_freeway_game();
  if (task == "Boxing-v5") return make_boxing_game();
  if (task == "Seaquest-v5") return make_seaquest_game();
  if (task == "Qbert-v5") return make_qbert_game();
  if (task == "Asterix-v5") return make_asterix_game();
  if (task == "MsPacman-v5") return make_mspacman_game();
  if (task == "DemonAttack-v5") return make_demon_attack_game();
  if (task == "Enduro-v5") return make_enduro_game();
  if (task == "Atlantis-v5") return make_atlantis_game();
  if (task == "Bowling-v5") return make_bowling_game();
  if (task == "FishingDerby-v5") return make_fishing_derby_game();
  if (task == "CrazyClimber-v5") return make_crazy_climber_game();
  if (task == "Assault-v5") return make_assault_game();
  if (task == "Phoenix-v5") return make_phoenix_game();
  if (task == "Gopher-v5") return make_gopher_game();
  if (task == "NameThisGame-v5") return make_name_this_game_game();
  if (task == "Riverraid-v5") return make_riverraid_game();
  if (task == "KungFuMaster-v5") return make_kung_fu_master_game();
  if (task == "Tennis-v5") return make_tennis_game();
  if (task == "StarGunner-v5") return make_star_gunner_game();
  if (task == "Amidar-v5") return make_amidar_game();
  if (task == "BankHeist-v5") return make_bank_heist_game();
  if (task == "UpNDown-v5") return make_up_n_down_game();
  if (task == "TimePilot-v5") return make_time_pilot_game();
  if (task == "Alien-v5") return make_alien_game();
  if (task == "RoadRunner-v5") return make_road_runner_game();
  if (task == "Skiing-v5") return make_skiing_game();
  if (task == "Frostbite-v5") return make_frostbite_game();
  if (task == "Kangaroo-v5") return make_kangaroo_game();
  if (task == "ChopperCommand-v5") return make_chopper_command_game();
  if (task == "Jamesbond-v5") return make_jamesbond_game();
  if (task == "Zaxxon-v5") return make_zaxxon_game();
  if (task == "Berzerk-v5") return make_berzerk_game();
  if (task == "WizardOfWor-v5") return make_wizard_of_wor_game();
  if (task == "Asteroids-v5") return make_asteroids_game();
  if (task == "Centipede-v5") return make_centipede_game();
  if (task == "Tutankham-v5") return make_tutankham_game();
  if (task == "Venture-v5") return make_venture_game();
  if (task == "IceHockey-v5") return make_ice_hockey_game();
  if (task == "BattleZone-v5") return make_battlezone_game();
  if (task == "Surround-v5") return make_surround_game();
  if (task == "Defender-v5") return make_defender_game();
  if (task == "Robotank-v5") return make_robotank_game();
  if (task == "Gravitar-v5") return make_gravitar_game();
  if (task == "DoubleDunk-v5") return make_double_dunk_game();
  if (task == "Hero-v5") return make_hero_game();
  if (task == "YarsRevenge-v5") return make_yars_revenge_game();
  if (task == "Krull-v5") return make_krull_game();
  if (task == "MontezumaRevenge-v5") return make_montezuma_game();
  if (task == "Pitfall-v5") return make_pitfall_game();
  if (task == "PrivateEye-v5") return make_private_eye_game();
  if (task == "Solaris-v5") return make_solaris_game();
  if (task == "VideoPinball-v5") return make_video_pinball_game();
  return nullptr;
}

// Procgen-family tasks (64x64 RGB, 15 actions, procedural levels). Ids follow
// EnvPool's procgen naming: <Game>{Easy,Hard}-v0; bare <Game>-v0 = easy.
std::unique_ptr<Env> make_procgen(const std::string& task, const EnvOptions& opts) {
  if (task == "Bigfish-v0" || task == "BigfishEasy-v0") return make_bigfish_env(opts, false);
  if (task == "BigfishHard-v0") return make_bigfish_env(opts, true);
  if (task == "Maze-v0" || task == "MazeEasy-v0") return make_maze_env(opts, false);
  if (task == "MazeHard-v0") return make_maze_env(opts, true);
  if (task == "Leaper-v0" || task == "LeaperEasy-v0") return make_leaper_env(opts, false);
  if (task == "LeaperHard-v0") return make_leaper_env(opts, true);
  if (task == "Chaser-v0" || task == "ChaserEasy-v0") return make_chaser_env(opts, false);
  if (task == "ChaserHard-v0") return make_chaser_env(opts, true);
  if (task == "Starpilot-v0" || task == "StarpilotEasy-v0") return make_starpilot_env(opts, false);
  if (task == "StarpilotHard-v0") return make_starpilot_env(opts, true);
  if (task == "Fruitbot-v0" || task == "FruitbotEasy-v0") return make_fruitbot_env(opts, false);
  if (task == "FruitbotHard-v0") return make_fruitbot_env(opts, true);
  if (task == "Coinrun-v0" || task == "CoinrunEasy-v0") return make_coinrun_env(opts, false);
  if (task == "CoinrunHard-v0") return make_coinrun_env(opts, true);
  if (task == "Miner-v0" || task == "MinerEasy-v0") return make_miner_env(opts, false);
  if (task == "MinerHard-v0") return make_miner_env(opts, true);
  if (task == "Heist-v0" || task == "HeistEasy-v0") return make_heist_env(opts, false);
  if (task == "HeistHard-v0") return make_heist_env(opts, true);
  if (task == "Jumper-v0" || task == "JumperEasy-v0") return make_jumper_env(opts, false);
  if (task == "JumperHard-v0") return make_jumper_env(opts, true);
  if (task == "Ninja-v0" || task == "NinjaEasy-v0") return make_ninja_env(opts, false);
  if (task == "NinjaHard-v0") return make_ninja_env(opts, true);
  if (task == "Plunder-v0" || task == "PlunderEasy-v0") return make_plunder_env(opts, false);
  if (task == "PlunderHard-v0") return make_plunder_env(opts, true);
  if (task == "Caveflyer-v0" || task == "CaveflyerEasy-v0") return make_caveflyer_env(opts, false);
  if (task == "CaveflyerHard-v0") return make_caveflyer_env(opts, true);
  if (task == "Climber-v0" || task == "ClimberEasy-v0") return make_climber_env(opts, false);
  if (task == "ClimberHard-v0") return make_climber_env(opts, true);
  if (task == "Dodgeball-v0" || task == "DodgeballEasy-v0") return make_dodgeball_env(opts, false);
  if (task == "DodgeballHard-v0") return make_dodgeball_env(opts, true);
  if (task == "Bossfight-v0" || task == "BossfightEasy-v0") return make_bossfight_env(opts, false);
  if (task == "BossfightHard-v0") return make_bossfight_env(opts, true);
  return nullptr;
}

bool is_procgen(const std::string& task) {
  EnvOptions probe;
  return make_procgen(task, probe) != nullptr;
}

}  // namespace

std::unique_ptr<Env> make_env(const std::string& task, const EnvOptions& opts) {
  if (task == "CartPole-v1") return make_cartpole_env(opts);
  if (auto pg = make_procgen(task, opts)) return pg;
  if (auto game = make_game(task)) return std::make_unique<AtariLikeEnv>(std::move(game), opts);
  return nullptr;
}

bool task_info(const std::string& task, const EnvOptions& opts, TaskInfo* out) {
  if (task == "CartPole-v1") {
    out->obs_shape = {4};
    out->obs_dtype = 1;  // float32
    out->num_actions = 2;
    out->obs_size_bytes = 4 * sizeof(float);
    return true;
  }
  if (is_procgen(task)) {
    out->obs_shape = {kPg, kPg, 3};
    out->obs_dtype = 0;  // uint8
    out->num_actions = 15;
    out->obs_size_bytes = kPgObsBytes;
    return true;
  }
  if (auto game = make_game(task)) {
    out->obs_shape = {kScreen, kScreen, opts.frame_stack};
    out->obs_dtype = 0;  // uint8
    out->num_actions = opts.full_action_space ? 18 : game->minimal_actions();
    out->obs_size_bytes = static_cast<int64_t>(kScreenPx) * opts.frame_stack;
    return true;
  }
  return false;
}

}  // namespace cleanba
