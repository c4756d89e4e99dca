from cleanba_tpu.utils.cli import parse_cli
from cleanba_tpu.utils.metrics import DummyWriter, MetricsWriter, make_writer
from cleanba_tpu.utils.timers import SegmentTimers

__all__ = ["parse_cli", "DummyWriter", "MetricsWriter", "make_writer", "SegmentTimers"]
