"""jax.profiler trace hooks.

Reference schedules a Perfetto trace between learner updates 4 and 15
(legacy_scripts/..._asap_profile.py:282-286, 429-433). On TPU the native
XPlane/TensorBoard trace is the useful artifact, so we emit that (the trace dir
can be opened with `tensorboard --logdir`), with Perfetto output kept as an
option.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["TraceWindow", "find_perfetto_trace_json_gz", "publish_perfetto_trace"]

TRACE_START_UPDATE = 4
TRACE_STOP_UPDATE = 15


class TraceWindow:
    """Starts/stops a jax.profiler trace over a window of learner updates."""

    def __init__(self, trace_dir: str, start: int = TRACE_START_UPDATE, stop: int = TRACE_STOP_UPDATE):
        self.trace_dir = trace_dir
        self.start_update = start
        self.stop_update = stop
        self._active = False

    def step(self, update: int) -> None:
        if not self.trace_dir:
            return
        if update == self.start_update and not self._active:
            logger.info("starting jax.profiler trace -> %s", self.trace_dir)
            jax.profiler.start_trace(self.trace_dir, create_perfetto_trace=True)
            self._active = True
        elif update == self.stop_update and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("stopped jax.profiler trace")
            publish_perfetto_trace(self.trace_dir)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            publish_perfetto_trace(self.trace_dir)


def find_perfetto_trace_json_gz(trace_dir: str):
    """Locate the perfetto_trace.json.gz jax.profiler wrote under trace_dir
    (reference ..._asap_profile.py:753-760 walks the plugin dir the same way)."""
    import glob
    import os

    hits = glob.glob(
        os.path.join(trace_dir, "**", "perfetto_trace.json.gz"), recursive=True
    )
    return hits[0] if hits else None


_PERFETTO_LOADER = """<!doctype html>
<html>
<body>
<p>Opening the captured trace in ui.perfetto.dev ...</p>
<script>
// Fetch the local trace and hand it to the Perfetto UI via postMessage
// (the reference serves the same flow through a wandb-hosted page,
// legacy_scripts/..._asap_profile.py:763-845).
const TRACE = 'perfetto_trace.json.gz';
async function open_trace() {
  const resp = await fetch(TRACE);
  const blob = await resp.arrayBuffer();
  const win = window.open('https://ui.perfetto.dev');
  const onReady = (evt) => {
    if (evt.data !== 'PONG') return;
    window.clearInterval(ping);
    win.postMessage({perfetto: {buffer: blob, title: 'cleanba_tpu trace'}}, '*');
  };
  window.addEventListener('message', onReady);
  const ping = window.setInterval(() => win.postMessage('PING', '*'), 50);
}
open_trace();
</script>
</body>
</html>
"""


def publish_perfetto_trace(trace_dir: str):
    """Publish the captured Perfetto trace: copy it next to a self-contained
    ui.perfetto.dev loader page, and (when a wandb run is live) upload both as
    an artifact — behavior parity with the reference's profile variant
    (..._asap_profile.py:740-863), minus its mitmproxy reverse proxy.

    Returns the loader path, or None if no trace was found."""
    import os
    import shutil

    src = find_perfetto_trace_json_gz(trace_dir)
    if src is None:
        logger.warning("no perfetto_trace.json.gz found under %s", trace_dir)
        return None
    out_dir = os.path.join(trace_dir, "perfetto")
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "perfetto_trace.json.gz")
    if os.path.abspath(src) != os.path.abspath(dst):
        shutil.copyfile(src, dst)
    loader = os.path.join(out_dir, "perfetto.html")
    with open(loader, "w") as f:
        f.write(_PERFETTO_LOADER)
    logger.info("perfetto trace published: %s (serve the dir and open the page)", loader)

    try:  # wandb is optional; only upload when a run is already active
        import wandb  # type: ignore

        if wandb.run is not None:
            art = wandb.Artifact(f"perfetto-trace-{wandb.run.id}", type="profile")
            art.add_file(dst)
            art.add_file(loader)
            wandb.log_artifact(art)
    except ImportError:
        pass
    return loader
