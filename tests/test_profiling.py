"""TraceWindow + Perfetto publishing (reference profile variant,
legacy_scripts/..._asap_profile.py:282-286, 740-863)."""

import os

import jax
import jax.numpy as jnp

from cleanba_tpu.utils.profiling import (
    TraceWindow,
    find_perfetto_trace_json_gz,
    publish_perfetto_trace,
)


def test_trace_window_captures_and_publishes(tmp_path):
    trace_dir = str(tmp_path / "trace")
    tw = TraceWindow(trace_dir, start=2, stop=4)
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.ones((64, 64))
    for update in range(1, 6):
        tw.step(update)
        f(x).block_until_ready()
    tw.close()
    # The profiler wrote a perfetto trace and publish() produced the loader.
    assert find_perfetto_trace_json_gz(trace_dir) is not None
    loader = os.path.join(trace_dir, "perfetto", "perfetto.html")
    assert os.path.exists(loader)
    assert os.path.exists(os.path.join(trace_dir, "perfetto", "perfetto_trace.json.gz"))
    assert "ui.perfetto.dev" in open(loader).read()


def test_publish_without_trace_is_noop(tmp_path):
    assert publish_perfetto_trace(str(tmp_path)) is None
