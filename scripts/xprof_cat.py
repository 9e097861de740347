"""Aggregate an xplane.pb trace's 'XLA Ops' line by op CATEGORY
(convolution / dot / elementwise fusion / copy / reduce / custom-call),
to see where a module's device time goes at a glance.

  python scripts/xprof_cat.py <trace.xplane.pb> [min_ms]
"""

import re
import sys
from collections import defaultdict


def categorize(name: str) -> str:
  if "pallas" in name or "custom-call" in name:
    return "pallas/custom-call"
  if name.startswith("%while"):
    return "while(scan)"
  if "convolution" in name or re.search(r"%conv", name):
    return "convolution"
  if "dot" in name or "matmul" in name:
    return "dot"
  if "all-reduce" in name or "all-gather" in name or "psum" in name:
    return "collective"
  if "copy" in name or "slice" in name or "bitcast" in name \
      or "transpose" in name or "concatenate" in name or "pad" in name:
    return "data-movement"
  if "reduce" in name:
    return "reduce-fusion"
  if "convert" in name:
    return "convert-fusion"
  if "fusion" in name:
    return "elementwise-fusion"
  if "rng" in name or "threefry" in name:
    return "rng"
  return "other"


def main():
  from tensorflow.tsl.profiler.protobuf import xplane_pb2

  path = sys.argv[1]
  min_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
  with open(path, "rb") as f:
    space = xplane_pb2.XSpace()
    space.ParseFromString(f.read())

  for plane in space.planes:
    if "TPU" not in plane.name:
      continue
    ev_meta = plane.event_metadata
    for line in plane.lines:
      if line.name != "XLA Ops":
        continue
      cats = defaultdict(float)
      tops = defaultdict(lambda: defaultdict(float))
      total = 0.0
      for ev in line.events:
        name = (ev_meta[ev.metadata_id].name
                if ev.metadata_id in ev_meta else "?")
        dur = ev.duration_ps / 1e9
        cat = categorize(name)
        cats[cat] += dur
        tops[cat][name.split(" = ")[0]] += dur
        total += dur
      print(f"=== XLA Ops total {total:.1f} ms")
      for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:22s} {ms:8.1f} ms  ({100 * ms / total:4.1f}%)")
        for nm, nms in sorted(tops[cat].items(), key=lambda kv: -kv[1])[:4]:
          if nms >= min_ms:
            print(f"      {nms:8.1f} ms  {nm[:90]}")


if __name__ == "__main__":
  main()
