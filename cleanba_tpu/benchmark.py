"""Experiment orchestrator (reference cleanrl_utils/benchmark.py, 137 LoC).

Builds the seed × env-id command matrix and runs it either locally through a
thread pool or by expanding a SLURM array-job template. Keeps the reference's
wandb autotagging behavior (git describe + optional PR lookup) when a git repo
and network are available.

    python -m cleanba_tpu.benchmark \
        --env-ids Breakout-v5 Pong-v5 --num-seeds 3 \
        --command "python -m cleanba_tpu.train_ppo --total-timesteps 1000000" \
        --workers 1
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List

__all__ = ["parse_args", "run_experiment", "autotag", "main"]

SLURM_TEMPLATE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cleanba_tpu.slurm_template")


@dataclass
class BenchArgs:
    env_ids: List[str] = field(default_factory=lambda: ["Breakout-v5"])
    command: str = "python -m cleanba_tpu.train_ppo"
    num_seeds: int = 3
    start_seed: int = 1
    workers: int = 0
    auto_tag: bool = True
    timeout_minutes: float = 0.0
    retries: int = 0
    slurm_template_path: str = ""
    slurm_gpus_per_task: int = 0
    slurm_total_cpus: int = 8
    slurm_ntasks: int = 1
    slurm_nodes: int = 1


def parse_args(argv=None) -> BenchArgs:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env-ids", nargs="+", default=["Breakout-v5"])
    p.add_argument("--command", type=str, default="python -m cleanba_tpu.train_ppo")
    p.add_argument("--num-seeds", type=int, default=3)
    p.add_argument("--start-seed", type=int, default=1)
    p.add_argument("--workers", type=int, default=0, help="0 = run sequentially, N = thread pool")
    p.add_argument("--timeout-minutes", type=float, default=0.0,
                   help="kill a job that exceeds this wall-clock budget (0 = no limit)")
    p.add_argument("--retries", type=int, default=0,
                   help="re-launch a failed/timed-out job up to N times (local analog of "
                        "the reference's SLURM --requeue, cleanba.slurm_template:5); pair "
                        "with --resume + a deterministic --run-name so retries continue "
                        "from the last checkpoint")
    p.add_argument("--auto-tag", action="store_true", default=True)
    p.add_argument("--no-auto-tag", dest="auto_tag", action="store_false")
    p.add_argument("--slurm-template-path", type=str, default="")
    p.add_argument("--slurm-gpus-per-task", type=int, default=0)
    p.add_argument("--slurm-total-cpus", type=int, default=8)
    p.add_argument("--slurm-ntasks", type=int, default=1)
    p.add_argument("--slurm-nodes", type=int, default=1)
    ns = p.parse_args(argv)
    return BenchArgs(**vars(ns))


def autotag(github_repo: str = "") -> str:
    """git-describe tag plus the GitHub PR number of HEAD, for wandb run
    grouping (reference cleanrl_utils/benchmark.py:50-74). The PR lookup hits
    the GitHub search API for `github_repo` (or $CLEANBA_GITHUB_REPO) and
    degrades silently offline."""
    wandb_tag = ""
    try:
        git_tag = subprocess.check_output(
            ["git", "describe", "--tags", "--always"], stderr=subprocess.DEVNULL
        ).decode().strip()
        wandb_tag = git_tag
    except (subprocess.CalledProcessError, FileNotFoundError):
        return wandb_tag

    repo = github_repo or os.environ.get("CLEANBA_GITHUB_REPO", "")
    if not repo:
        return wandb_tag
    try:
        git_commit = subprocess.check_output(
            ["git", "rev-parse", "--verify", "HEAD"], stderr=subprocess.DEVNULL
        ).decode().strip()
        import requests

        resp = requests.get(
            f"https://api.github.com/search/issues?q=repo:{repo}+is:pr+{git_commit}",
            timeout=10,
        )
        if resp.status_code == 200:
            items = resp.json().get("items", [])
            if items:
                pr_number = items[0]["number"]
                wandb_tag += f",pr-{pr_number}"
                print(f"identified github pull request: {pr_number}")
    except Exception as e:  # offline / rate-limited / no requests: tag-only
        print(f"autotag PR lookup skipped: {e}")
    return wandb_tag


def run_experiment(command: str, timeout_minutes: float = 0.0, retries: int = 0) -> int:
    """Run one training command; raises if it fails (reference benchmark.py:42-47).

    `timeout_minutes` bounds each attempt's wall clock; `retries` re-launches a
    failed or timed-out job (the local analog of SLURM's `--requeue`,
    reference cleanba.slurm_template:5). A retried command that sets `--resume`
    and a deterministic `--run-name` continues from its last checkpoint."""
    timeout = timeout_minutes * 60 if timeout_minutes > 0 else None
    for attempt in range(retries + 1):
        print(f"running (attempt {attempt + 1}/{retries + 1}): {command}", flush=True)
        proc = subprocess.Popen(shlex.split(command), start_new_session=True)
        try:
            rc = proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"timeout after {timeout_minutes} min, killing: {command}", flush=True)
            try:
                os.killpg(proc.pid, 15)
                proc.wait(timeout=30)
            except (ProcessLookupError, subprocess.TimeoutExpired):
                try:
                    os.killpg(proc.pid, 9)
                except ProcessLookupError:
                    pass
                proc.wait()
            rc = -1
        if rc == 0:
            return rc
        print(f"command failed with code {rc}: {command}", flush=True)
    raise AssertionError(f"command failed after {retries + 1} attempts: {command}")


def build_commands(args: BenchArgs) -> List[str]:
    return [
        f"{args.command} --env-id {env_id} --seed {seed}"
        for env_id in args.env_ids
        for seed in range(args.start_seed, args.start_seed + args.num_seeds)
    ]


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.auto_tag:
        tag = autotag()
        if tag:
            existing = os.environ.get("WANDB_TAGS", "")
            os.environ["WANDB_TAGS"] = f"{existing},{tag}".strip(",")

    commands = build_commands(args)

    if args.slurm_template_path:
        with open(args.slurm_template_path) as f:
            template = f.read()
        filled = (
            template.replace("{{array}}", f"0-{len(commands) - 1}")
            .replace("{{env_ids}}", " ".join(args.env_ids))
            .replace("{{seeds}}", " ".join(str(s) for s in range(args.start_seed, args.start_seed + args.num_seeds)))
            .replace("{{command}}", args.command)
            .replace("{{gpus_per_task}}", str(args.slurm_gpus_per_task))
            .replace("{{total_cpus}}", str(args.slurm_total_cpus))
            .replace("{{ntasks}}", str(args.slurm_ntasks))
            .replace("{{nodes}}", str(args.slurm_nodes))
        )
        os.makedirs("slurm", exist_ok=True)
        path = os.path.join("slurm", f"{uuid.uuid4()}.slurm")
        with open(path, "w") as f:
            f.write(filled)
        print(f"wrote {path}")
        subprocess.run(["sbatch", path], check=True)
        return

    if args.workers > 0:
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            futures = [
                pool.submit(run_experiment, c, args.timeout_minutes, args.retries)
                for c in commands
            ]
            for f in futures:
                f.result()
    else:
        for c in commands:
            run_experiment(c, args.timeout_minutes, args.retries)


if __name__ == "__main__":
    main()
