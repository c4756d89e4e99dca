"""Learning-curve plotting from TensorBoard event files.

Parity with the reference's openrlbenchmark-based plotting (static/plot.sh):
reads `charts/avg_episodic_return` (and any other scalar tags) from one or
more run directories, aligns by global step, and renders mean±std learning
curves across seeds to PNG.

    python -m cleanba_tpu.plot --runs runs/Breakout-v5__ppo__1__* \
        --tag charts/avg_episodic_return --out curves.png
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["read_scalars", "group_runs", "main"]


def read_scalars(run_dir: str, tag: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read (steps, values) for a scalar tag from a run's event files."""
    from tensorboardX.event_file_writer import EventFileWriter  # noqa: F401  (ensures tbX present)
    try:
        from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
    except ImportError:
        # Minimal fallback: parse event files with the tensorboardX proto.
        return _read_scalars_proto(run_dir, tag)
    acc = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    acc.Reload()
    if tag not in acc.Tags().get("scalars", []):
        return np.array([]), np.array([])
    events = acc.Scalars(tag)
    return np.array([e.step for e in events]), np.array([e.value for e in events])


def _read_scalars_proto(run_dir: str, tag: str) -> Tuple[np.ndarray, np.ndarray]:
    import struct

    from tensorboardX.proto import event_pb2

    steps, values = [], []
    for path in sorted(glob.glob(os.path.join(run_dir, "events.out.tfevents.*"))):
        with open(path, "rb") as f:
            data = f.read()
        off = 0
        while off + 12 <= len(data):
            (length,) = struct.unpack_from("<Q", data, off)
            off += 12  # length + len-crc
            if off + length + 4 > len(data):
                break
            ev = event_pb2.Event()
            try:
                ev.ParseFromString(data[off : off + length])
            except Exception:
                break
            off += length + 4  # payload + payload-crc
            for v in ev.summary.value:
                if v.tag == tag and v.HasField("simple_value"):
                    steps.append(ev.step)
                    values.append(v.simple_value)
    return np.array(steps), np.array(values)


def group_runs(run_dirs: List[str]) -> Dict[str, List[str]]:
    """Group run dirs by experiment identity (env__exp), ignoring seed/time."""
    groups = defaultdict(list)
    for d in run_dirs:
        name = os.path.basename(os.path.normpath(d))
        parts = name.split("__")
        key = "__".join(parts[:2]) if len(parts) >= 2 else name
        groups[key].append(d)
    return dict(groups)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="+", required=True, help="run directories (globs ok)")
    p.add_argument("--tag", default="charts/avg_episodic_return")
    p.add_argument("--out", default="curves.png")
    p.add_argument("--smooth", type=int, default=10, help="moving-average window")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    run_dirs = [d for pat in args.runs for d in sorted(glob.glob(pat)) if os.path.isdir(d)]
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, dirs in group_runs(run_dirs).items():
        curves = []
        for d in dirs:
            steps, vals = read_scalars(d, args.tag)
            if len(steps):
                if args.smooth > 1 and len(vals) > args.smooth:
                    k = np.ones(args.smooth) / args.smooth
                    vals = np.convolve(vals, k, mode="valid")
                    steps = steps[: len(vals)]
                curves.append((steps, vals))
        if not curves:
            continue
        # align on the shortest run
        n = min(len(s) for s, _ in curves)
        xs = curves[0][0][:n]
        ys = np.stack([v[:n] for _, v in curves])
        mean, std = ys.mean(0), ys.std(0)
        ax.plot(xs, mean, label=f"{label} (n={len(curves)})")
        ax.fill_between(xs, mean - std, mean + std, alpha=0.2)
    ax.set_xlabel("global step")
    ax.set_ylabel(args.tag)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
