"""Benchmark orchestrator: command matrix and SLURM template expansion."""

import os

from cleanba_tpu.benchmark import BenchArgs, build_commands, main, parse_args


def test_command_matrix():
    args = BenchArgs(env_ids=["A-v5", "B-v5"], num_seeds=3, command="python -m x")
    cmds = build_commands(args)
    assert len(cmds) == 6
    assert cmds[0] == "python -m x --env-id A-v5 --seed 1"
    assert cmds[-1] == "python -m x --env-id B-v5 --seed 3"


def test_parse_args():
    args = parse_args(["--env-ids", "Pong-v5", "--num-seeds", "2", "--workers", "4"])
    assert args.env_ids == ["Pong-v5"]
    assert args.num_seeds == 2
    assert args.workers == 4


def test_local_execution(tmp_path):
    marker = tmp_path / "ran.txt"
    main([
        "--env-ids", "X-v5", "--num-seeds", "2", "--no-auto-tag",
        "--command", f"python -c \"open(r'{marker}','a').write('1')\" --ignore",
    ])
    # the orchestrator appends --env-id/--seed flags; the -c script ignores argv
    assert marker.read_text() == "11"


def test_slurm_template_expansion(tmp_path, monkeypatch):
    import cleanba_tpu.benchmark as bench

    calls = []
    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: calls.append(a))
    monkeypatch.chdir(tmp_path)
    template = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(bench.__file__))), "cleanba_tpu.slurm_template")
    main([
        "--env-ids", "Breakout-v5", "--num-seeds", "2", "--no-auto-tag",
        "--command", "python -m cleanba_tpu.train_ppo",
        "--slurm-template-path", template,
    ])
    slurm_files = os.listdir(tmp_path / "slurm")
    assert len(slurm_files) == 1
    content = (tmp_path / "slurm" / slurm_files[0]).read_text()
    assert "--array=0-1" in content
    assert "Breakout-v5" in content
    assert "{{" not in content  # all placeholders filled
    assert calls and calls[0][0][0] == "sbatch"
