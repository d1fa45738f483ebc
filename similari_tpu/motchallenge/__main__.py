"""CLI: `python -m similari_tpu.motchallenge <config.yml>`.

Mirrors `/root/reference/python/motchallenge/__main__.py:17-84`: run the
configured tracker over every sequence under data_path, write MOT-format
results + processing_stats.csv, print CLEAR + Identity metrics per sequence.
"""

import json
import sys

from .config import load_config, run_from_config


def main():
    if len(sys.argv) != 2:
        print("usage: python -m similari_tpu.motchallenge <config.yml>",
              file=sys.stderr)
        return 2
    cfg = load_config(sys.argv[1])
    print(f"config: {cfg}", file=sys.stderr)
    results = run_from_config(sys.argv[1])
    for seq, metrics in results.items():
        print(f"{seq}: " + " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        ), file=sys.stderr)
    print(json.dumps({cfg.name: results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
