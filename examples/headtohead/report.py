"""Merge the two head-to-head result.json files into the committed
RESULTS.json artifact that bench.py's ``cer_vs_reference_ratio`` metric
reads (retraining both frameworks inside bench would take hours; the
protocol in README.md here reproduces the artifact with one command per
side).

Usage:
  python examples/headtohead/report.py \
      --ref /tmp/h2h_ref/result.json --ours /tmp/h2h_ours/result.json \
      --out examples/headtohead/RESULTS.json [--note "..."]
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True)
    p.add_argument("--ours", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--note", default="")
    args = p.parse_args(argv)

    with open(args.ref) as f:
        ref = json.load(f)
    with open(args.ours) as f:
        ours = json.load(f)

    merged = {
        "protocol": "examples/headtohead/README.md",
        "note": args.note,
        "reference": ref,
        "ours": ours,
        "phone_cer_ours": float(ours["phone_cer"]),
        "phone_cer_reference": float(ref["phone_cer"]),
        "char_cer_ours": float(ours.get("txt_cer", ours.get("char_cer"))),
        "char_cer_reference": float(ref.get("txt_cer", ref.get("char_cer"))),
    }
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged, indent=2))


if __name__ == "__main__":
    main()
