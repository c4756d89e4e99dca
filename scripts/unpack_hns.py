"""Rebuild aggregator-readable run dirs from the packaged HNS curve files.

`scripts/package_hns.sh` copies each sweep run's TensorBoard event file to
`static/hns_curves/{run_dir_tag}_hns_{env_id}_s{seed}.tfevents`. The raw
`runs/` tree is untracked and does not survive the sandbox between sessions,
so extending the sweep later (another seed, a re-calibrated game) needs the
packaged files turned back into the `runs/<tag>/hns_{env_id}_s{seed}/
events.out.tfevents.*` layout that `scripts/hns_aggregate.py` reads:

    python scripts/unpack_hns.py --out runs/prev
    python scripts/hns_aggregate.py --runs 'runs/prev/*/hns_*' 'runs/hns10m/hns_*' ...

Each packaged file becomes its own run dir grouped by original sweep tag
(`hns10m`, `hns50m`, ...), preserving the aggregator's longest-run-wins merge
across budgets.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil


def unpack(src_glob: str, out_root: str) -> int:
    n = 0
    for path in sorted(glob.glob(src_glob)):
        name = os.path.basename(path)
        m = re.match(r"(.+?)_(hns_.+_s\d+)\.tfevents$", name)
        if not m:
            print(f"skipping unrecognized curve file {name}")
            continue
        tag, run_name = m.group(1), m.group(2)
        run_dir = os.path.join(out_root, tag, run_name)
        os.makedirs(run_dir, exist_ok=True)
        shutil.copy(path, os.path.join(run_dir, "events.out.tfevents.0"))
        n += 1
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--curves", default="static/hns_curves/*.tfevents")
    p.add_argument("--out", default="runs/prev")
    args = p.parse_args(argv)
    n = unpack(args.curves, args.out)
    print(f"unpacked {n} packaged runs into {args.out}/")


if __name__ == "__main__":
    main()
