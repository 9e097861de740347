"""CLI entry point.

API-compatible with the reference (`/root/reference/main.py:29-89`):
  python main.py --mode {train,eval} --config <config.py> --workdir <dir>
with any config leaf overridable as --config.a.b=v (ml_collections
config_flags). Logs to <workdir>/stdout.txt (train) or
evaluation_history.txt (eval); dumps the config to config.txt.
"""

import logging
import os
import sys

from absl import app, flags
from ml_collections import config_flags

config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=True)
flags.DEFINE_string("workdir", None, "Work directory.")
flags.DEFINE_enum("mode", None, ["train", "eval"],
                  "Running mode: train or eval")
flags.DEFINE_string("assetdir", "assets/stats/", "The folder name for assets")
flags.DEFINE_string("eval_folder", "eval",
                    "The folder name for storing evaluation results")
flags.mark_flags_as_required(["workdir", "config", "mode"])

FLAGS = flags.FLAGS


def main(argv):
  from indm_tpu import parallel, run_lib

  # multi-host entry: no-op unless a coordinator is configured in the
  # environment (SURVEY.md §2.7 — replaces the reference's dead NCCL DDP)
  parallel.initialize_distributed()

  os.makedirs(FLAGS.workdir, exist_ok=True)
  with open(os.path.join(FLAGS.workdir, "config.txt"), "w") as f:
    f.write(str(FLAGS.config))

  log_name = "stdout.txt" if FLAGS.mode == "train" else \
      "evaluation_history.txt"
  handler = logging.FileHandler(os.path.join(FLAGS.workdir, log_name))
  stream = logging.StreamHandler(sys.stdout)
  formatter = logging.Formatter(
      "%(levelname)s - %(filename)s - %(asctime)s - %(message)s")
  for h in (handler, stream):
    h.setFormatter(formatter)
  root = logging.getLogger()
  root.addHandler(handler)
  root.addHandler(stream)
  root.setLevel("INFO")

  if FLAGS.mode == "train":
    run_lib.train(FLAGS.config, FLAGS.workdir, FLAGS.assetdir)
  elif FLAGS.mode == "eval":
    run_lib.evaluate(FLAGS.config, FLAGS.workdir, FLAGS.assetdir,
                     FLAGS.eval_folder)
  else:
    raise ValueError(f"Mode {FLAGS.mode} not recognized.")


if __name__ == "__main__":
  app.run(main)
