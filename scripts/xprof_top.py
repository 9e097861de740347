"""Capture a jax.profiler trace of the flow step and print top ops.

Parses the xplane.pb directly (no TensorBoard needed): aggregates TPU
op durations by name/category and prints the top-k.

  python scripts/xprof_top.py [fwd|fwd+logdet|grad] [topk]
Env: PF_* as in profile_flow.py.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path, topk=30):
  from tensorflow.tsl.profiler.protobuf import xplane_pb2

  with open(path, "rb") as f:
    space = xplane_pb2.XSpace()
    space.ParseFromString(f.read())

  for plane in space.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
      continue
    print(f"\n=== plane: {plane.name}")
    ev_meta = plane.event_metadata
    stats_meta = plane.stat_metadata
    totals = defaultdict(float)
    counts = defaultdict(int)
    line_total = 0.0
    for line in plane.lines:
      if "XLA Ops" not in line.name and "Steps" not in line.name \
          and len(plane.lines) > 1:
        # prefer the op-level line when present
        pass
      for ev in line.events:
        name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta \
            else str(ev.metadata_id)
        dur = ev.duration_ps / 1e9  # ms
        key = (line.name, name)
        totals[key] += dur
        counts[key] += 1
        line_total += dur
    by_line = defaultdict(float)
    for (ln, _), v in totals.items():
      by_line[ln] += v
    for ln, v in sorted(by_line.items(), key=lambda kv: -kv[1]):
      print(f"  line {ln!r}: total {v:.2f} ms")
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:topk]
    for (ln, name), v in top:
      print(f"  {v:9.3f} ms x{counts[(ln, name)]:4d}  [{ln}] {name[:110]}")


def main():
  which = sys.argv[1] if len(sys.argv) > 1 else "grad"
  topk = int(sys.argv[2]) if len(sys.argv) > 2 else 30

  import jax
  import jax.numpy as jnp
  import numpy as np

  from indm_tpu import parallel
  from indm_tpu.configs import get_config
  from indm_tpu.flows.flow_model import create_flow_model, flow_forward

  parallel.enable_compilation_cache()
  batch = int(os.environ.get("PF_BATCH", 128))
  cfg = get_config("vp/CIFAR10/indm_nll")
  cfg.flow.logdet_unroll = int(os.environ.get("PF_UNROLL", 0))
  cfg.flow.logdet_bf16 = bool(int(os.environ.get("PF_BF16", "1")))
  cfg.flow.mixed_precision = bool(int(os.environ.get("PF_MP", "1")))
  cfg.flow.logdet_pallas = bool(int(os.environ.get("PF_PALLAS", "0")))
  cfg.flow.fused_block = bool(int(os.environ.get("PF_FUSED", "0")))

  fm = create_flow_model(cfg)
  params, buffers = fm.init(jax.random.PRNGKey(0))
  x = jnp.asarray(np.random.default_rng(0).uniform(
      -1, 1, (batch, 32, 32, 3)).astype(np.float32))
  rng = jax.random.PRNGKey(1)

  def fwd_only(p):
    z, _, _ = flow_forward(cfg, fm, p, buffers, x, rng=rng, train=True,
                           eval_logdet=False)
    return jnp.sum(z)

  def fwd_logdet(p):
    z, ld, _ = flow_forward(cfg, fm, p, buffers, x, rng=rng, train=True)
    return jnp.sum(z) + jnp.sum(ld)

  fn = {"fwd": jax.jit(fwd_only),
        "fwd+logdet": jax.jit(fwd_logdet),
        "grad": jax.jit(jax.grad(fwd_logdet))}[which]

  out = fn(params)
  float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

  trace_dir = os.environ.get("XPROF_DIR", "/tmp/xprof_trace")
  os.system(f"rm -rf {trace_dir}")
  jax.profiler.start_trace(trace_dir)
  for _ in range(2):
    out = fn(params)
  float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
  jax.profiler.stop_trace()

  planes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
  print("trace files:", planes)
  for p in planes:
    parse_xplane(p, topk)


if __name__ == "__main__":
  main()
