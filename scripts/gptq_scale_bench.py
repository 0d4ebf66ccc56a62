"""GPTQ Hessian-inverse at Gemma-7B FFN scale: timing + accuracy evidence.

VERDICT round-2 item 9: the on-device f32 Cholesky + Newton path
(algorithms/uniform/gptq.py:_inverse_via_cholesky_device) exists but had
no recorded evidence at a >=16k-dim Hessian. This measures:
  - device solve wall time at d=16384 (and 8192),
  - host f64 LAPACK path at d=4096 for comparison,
  - accuracy residual max|H @ X - I| for both,
  - the device path's analytic working-set size.
Writes GPTQ_SCALE_r04.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
if os.environ.get('JAX_PLATFORMS'):
  jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
# Persistent compilation cache: repeat runs (and the quantize pipeline
# itself) skip the tunnel compile entirely (VERDICT r3 items 5/6).
try:
  _cache_dir = os.environ.get('AEQT_XLA_CACHE', '/tmp/aeqt_xla_cache')
  os.makedirs(_cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', _cache_dir)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # noqa: BLE001
  pass
import jax.numpy as jnp
import numpy as np

from ai_edge_quantizer_tpu.algorithms.uniform import gptq  # noqa: E402


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def make_hessian_device(d: int, seed: int = 0) -> jax.Array:
  """A realistic 2/n X^T X calibration Hessian built ON DEVICE (n = 2d
  samples -> full rank, the conditioning a converged calibration run
  produces; GPTQ's 1% damping bounds the condition number regardless)."""
  key = jax.random.PRNGKey(seed)
  n = 2 * d
  h = jnp.zeros((d, d), jnp.float32)
  # Accumulate in 8 chunks so the [n, d] sample matrix never exists whole.
  for i in range(8):
    xk = jax.random.normal(jax.random.fold_in(key, i), (n // 8, d),
                           jnp.float32)
    h = h + xk.T @ xk
  h = h * (2.0 / n)
  return jax.block_until_ready(h)


def residual(h: np.ndarray, x: np.ndarray) -> float:
  d = h.shape[0]
  # Damped H is what was inverted; rebuild it the way gptq does.
  hd = np.array(h, np.float64)
  diag = np.diag(hd).copy()
  diag = np.where(diag != 0, diag, 1.0)
  np.fill_diagonal(hd, diag + gptq._DAMP_FACTOR * np.mean(diag))
  r = hd @ x.astype(np.float64) - np.eye(d)
  return float(np.max(np.abs(r)))


def main():
  results = {'backend': jax.default_backend()}

  for d in (8192, 16384):
    h_dev = make_hessian_device(d)
    t0 = time.perf_counter()
    x = gptq._inverse_via_cholesky_device(np.asarray(h_dev),
                                          gptq._DAMP_FACTOR)
    dt_cold = time.perf_counter() - t0  # includes the remote XLA compile
    # Warm solve through the raw solver so iteration count / device-side
    # residual are visible alongside the host-f64 residual check.
    solve = gptq._device_ns_solver(float(gptq._DAMP_FACTOR))
    t0 = time.perf_counter()
    xj, err_dev, iters = solve(jnp.asarray(h_dev))
    x = np.asarray(jax.device_get(xj))
    dt = time.perf_counter() - t0
    h_host = np.asarray(h_dev)
    res = residual(h_host, x)
    ws_gib = 3 * d * d * 4 / 2**30
    log(f'device d={d}: {dt:.2f}s warm / {dt_cold:.2f}s incl. compile, '
        f'residual {res:.2e} (device-iter err {float(err_dev):.2e}, '
        f'{int(iters)} NS steps), working set ~{ws_gib:.2f} GiB')
    # Multi-layer amortization: a real GPTQ pass solves one Hessian per
    # FC layer of the same few shapes; with the executable cached, each
    # additional layer costs only the solve. Measure 3 more same-d solves.
    layer_times = [dt]
    for seed in (2, 3, 4):
      h_i = make_hessian_device(d, seed=seed)
      t0 = time.perf_counter()
      xj, _, _ = solve(jnp.asarray(h_i))
      jax.block_until_ready(xj)
      layer_times.append(time.perf_counter() - t0)
      del h_i
    amortized = (dt_cold + sum(layer_times[1:])) / (1 + len(layer_times[1:]))
    log(f'device d={d}: per-layer solves {["%.1f" % t for t in layer_times]}'
        f' -> amortized {amortized:.1f}s/layer over 4 layers incl. compile')
    results[f'device_d{d}'] = {
        'solve_s': round(dt, 2), 'solve_incl_compile_s': round(dt_cold, 2),
        'residual_max': float(f'{res:.3e}'),
        'ns_steps': int(iters),
        'working_set_gib': round(ws_gib, 2),
        'per_layer_solve_s': [round(t, 2) for t in layer_times],
        'amortized_s_per_layer_4layers': round(amortized, 2),
    }
    del h_dev

  d = 4096
  h = np.asarray(make_hessian_device(d, seed=1))
  t0 = time.perf_counter()
  x_host = gptq._inverse_via_cholesky_host(h, gptq._DAMP_FACTOR)
  dt_host = time.perf_counter() - t0
  res_host = residual(h, x_host)
  log(f'host   d={d}: {dt_host:.2f}s, residual {res_host:.2e} '
      f'(f64 LAPACK)')
  results[f'host_d{d}'] = {
      'solve_s': round(dt_host, 2), 'residual_max': float(f'{res_host:.3e}'),
  }

  out_path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'GPTQ_SCALE_r04.json')
  with open(out_path, 'w') as f:
    json.dump(results, f, indent=1)
  print(json.dumps(results))
  log(f'artifact written: {out_path}')


if __name__ == '__main__':
  main()
