"""Int8 accuracy gate: score --int8 serving against the f32/bf16 baseline.

The bench reports int8 throughput alongside the bf16 headline because the
accuracy side needs the real AG assets (the `.pth` detector checkpoint and
annotation pickles are external data). When those assets are present, this
script closes the gate: it runs the SAME test split through
`cli.tempura_test` twice — plain and `--int8` — and prints the R@K/mR@K
deltas across all three constraint regimes.

    python scripts/compare_int8_metrics.py --mode sgdet \
        --data_path /data/AG/ --ckpt runs/ckpt --ckpt_name best_recall \
        [--pair_detect 2] [--max_videos 200] [any other tempura_test flag]

Exit code 1 if any with-constraint R@K drops by more than --budget
(default 0.005 absolute — the usual PTQ acceptance bar).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(flags):
    from vidsgg.cli import tempura_test

    evs = tempura_test.main(flags)
    out = {}
    for name, ev in zip(("with", "semi", "no"), evs):
        for k in ev.KS:
            out[f"{name}_R@{k}"] = float(ev.recall_at(k))
            out[f"{name}_mR@{k}"] = float(ev.calc_mrecall()[k])
    return out


def compare(passthrough, budget=0.005):
    """(rows, worst_with_delta, ok): the f32-vs-int8 grid and the gate."""
    base = run(list(passthrough))
    quant = run(list(passthrough) + ["--int8"])
    rows = {
        k: {"f32": base[k], "int8": quant[k],
            "delta": round(quant[k] - base[k], 6)}
        for k in base
    }
    worst = min(
        rows[k]["delta"] for k in rows if k.startswith("with_R@")
    )
    return rows, worst, worst >= -budget


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=float, default=0.005,
                   help="max allowed absolute with-constraint R@K drop")
    args, passthrough = p.parse_known_args(argv)

    rows, worst, ok = compare(passthrough, args.budget)
    print(json.dumps(rows, indent=2))
    print(f"worst with-constraint R@K delta: {worst:+.6f} "
          f"(budget -{args.budget}) -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
