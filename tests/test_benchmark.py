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


def test_retry_on_failure(tmp_path):
    """A failing job is re-launched up to --retries times (local analog of
    SLURM --requeue); success on a later attempt completes the sweep."""
    counter = tmp_path / "attempts.txt"
    # Fails on the first attempt (no file yet), succeeds on the second.
    script = (
        f"import os,sys; p=r'{counter}'; n=os.path.exists(p);"
        "open(p,'a').write('x'); sys.exit(0 if n else 1)"
    )
    main([
        "--env-ids", "X-v5", "--num-seeds", "1", "--no-auto-tag",
        "--retries", "2",
        "--command", f'python -c "{script}" --ignore',
    ])
    assert counter.read_text() == "xx"  # exactly two attempts


def test_retry_exhaustion_raises(tmp_path):
    import pytest

    with pytest.raises(AssertionError, match="failed after 2 attempts"):
        main([
            "--env-ids", "X-v5", "--num-seeds", "1", "--no-auto-tag",
            "--retries", "1",
            "--command", 'python -c "import sys; sys.exit(3)" --ignore',
        ])


def test_timeout_kills_hung_job(tmp_path):
    """A job exceeding --timeout-minutes is killed (whole process group) and
    counted as a failed attempt."""
    import time

    import pytest

    t0 = time.time()
    with pytest.raises(AssertionError, match="failed after 1 attempts"):
        main([
            "--env-ids", "X-v5", "--num-seeds", "1", "--no-auto-tag",
            "--timeout-minutes", "0.05",  # 3 seconds
            "--command", 'python -c "import time; time.sleep(60)" --ignore',
        ])
    assert time.time() - t0 < 30, "hung job was not killed promptly"
