"""Aggregate an xprof xplane.pb's synchronous [XLA Ops] line into coarse
op classes (conv/dot/fusion-kind/copy/...) to attribute step time.

  python scripts/xprof_agg.py [trace_dir=/tmp/xprof_joint] [topk=25]
"""

import glob
import re
import sys
from collections import defaultdict


def classify(name: str, expr: str) -> str:
  if "%convolution" in expr or name.startswith("%convolution"):
    return "convolution"
  m = re.match(r"%([a-zA-Z0-9_.]+)", name)
  base = m.group(1) if m else name
  base = re.sub(r"\.\d+$", "", base)
  return base


def main():
  trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_joint"
  topk = int(sys.argv[2]) if len(sys.argv) > 2 else 25

  from tensorflow.tsl.profiler.protobuf import xplane_pb2

  paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
  for path in paths:
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
        agg = defaultdict(float)
        n = defaultdict(int)
        total = 0.0
        for ev in line.events:
          md = ev_meta[ev.metadata_id]
          dur = ev.duration_ps / 1e9  # ms
          total += dur
          key = classify(md.name, md.display_name or md.name)
          agg[key] += dur
          n[key] += 1
        print(f"\n=== {plane.name} [XLA Ops] total {total:.2f} ms")
        for key, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:topk]:
          print(f"  {ms:9.3f} ms  x{n[key]:5d}  {key}")


if __name__ == "__main__":
  main()
