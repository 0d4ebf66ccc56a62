"""Progress reporting: wall time, peak host memory, model-size ratio.

Parity: reference `utils/progress_utils.py` (ProgressReport with tracemalloc
peak + size before/after; tqdm-style bars are omitted — pipeline passes here
are fast enough not to need them, logging covers long runs).
"""

from __future__ import annotations

import logging
import time
import tracemalloc
from typing import Optional

from ai_edge_quantizer_tpu.graph import ir


class ProgressReport:
  """Measures one quantization run and logs a summary."""

  def __init__(self, enable: bool = True):
    self.enable = enable
    self._start_time: Optional[float] = None
    self._size_before: int = 0
    self._tracing_started_here = False

  def start(self, float_graph: ir.Graph) -> None:
    if not self.enable:
      return
    self._start_time = time.perf_counter()
    self._size_before = float_graph.total_constant_bits() // 8
    if not tracemalloc.is_tracing():
      tracemalloc.start()
      self._tracing_started_here = True

  def finish(self, quantized_graph: ir.Graph) -> dict:
    if not self.enable or self._start_time is None:
      return {}
    elapsed = time.perf_counter() - self._start_time
    _, peak = tracemalloc.get_traced_memory()
    if self._tracing_started_here:
      tracemalloc.stop()
    size_after = quantized_graph.total_constant_bits() // 8
    ratio = size_after / max(self._size_before, 1)
    report = {
        'wall_time_s': elapsed,
        'peak_host_memory_bytes': peak,
        'model_size_before_bytes': self._size_before,
        'model_size_after_bytes': size_after,
        'size_ratio': ratio,
    }
    logging.info(
        'Quantization finished in %.2fs; peak host memory %.1f MiB; model '
        'size %.2f MiB -> %.2f MiB (%.1f%%).',
        elapsed, peak / 2**20, self._size_before / 2**20,
        size_after / 2**20, ratio * 100)
    return report
