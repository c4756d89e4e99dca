"""Hugging Face model-zoo publisher (reference cleanrl_utils/huggingface.py:13-147).

Creates/updates a model repo with the final model, a generated model card
(hyperparameters + reproduction command), TensorBoard events, and any eval
videos. Degrades gracefully when offline.
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
from typing import List

logger = logging.getLogger(__name__)

__all__ = ["push_to_hub"]

_CARD_TEMPLATE = """---
tags:
- deep-reinforcement-learning
- reinforcement-learning
- cleanba-tpu
library_name: cleanba_tpu
---

# {algo} agent playing {env_id}

Trained with **cleanba_tpu**, a TPU-native Sebulba actor-learner framework
(capability parity with [cleanba](https://github.com/vwxyzjn/cleanba)).

Mean eval episodic return: **{mean_return:.2f}** over {n_episodes} episodes.

## Reproduce

```bash
python -m cleanba_tpu.train_{algo_lower} {repro_flags}
```

## Hyperparameters

```
{hyperparams}
```
"""


def push_to_hub(
    cfg,
    episodic_returns: List[float],
    repo_id: str,
    algo: str,
    run_dir: str,
    video_dir: str = "",
) -> bool:
    try:
        from huggingface_hub import HfApi, upload_folder
    except ImportError:
        logger.warning("huggingface_hub not installed; skipping model upload")
        return False

    d = cfg.asdict()
    repro_flags = " ".join(
        f"--{k.replace('_', '-')} {v}" for k, v in d.items()
        if k in ("env_id", "seed", "total_timesteps", "learning_rate", "local_num_envs")
    )
    card = _CARD_TEMPLATE.format(
        algo=algo,
        algo_lower=algo.lower(),
        env_id=cfg.env_id,
        mean_return=sum(episodic_returns) / max(len(episodic_returns), 1),
        n_episodes=len(episodic_returns),
        repro_flags=repro_flags,
        hyperparams="\n".join(f"{k}: {v}" for k, v in sorted(d.items())),
    )

    try:
        with tempfile.TemporaryDirectory() as tmp:
            shutil.copytree(run_dir, os.path.join(tmp, "runs"), dirs_exist_ok=True)
            if video_dir and os.path.isdir(video_dir):
                shutil.copytree(video_dir, os.path.join(tmp, "videos"), dirs_exist_ok=True)
            with open(os.path.join(tmp, "README.md"), "w") as f:
                f.write(card)
            api = HfApi()
            api.create_repo(repo_id=repo_id, exist_ok=True)
            upload_folder(repo_id=repo_id, folder_path=tmp, path_in_repo="")
        logger.info("pushed model to https://huggingface.co/%s", repo_id)
        return True
    except Exception as e:  # offline / auth failures must not kill training
        logger.warning("HF upload failed (offline?): %s", e)
        return False
