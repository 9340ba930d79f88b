"""Merge head-to-head result.json files into the committed RESULTS.json
artifact that bench.py's ``headtohead_*`` metrics read (retraining both
frameworks inside bench would take hours; the protocol in README.md
reproduces every leg with one command per side).

Usage (round-4 multi-family form):
  python examples/headtohead/report.py --out examples/headtohead/RESULTS.json \
      --pair offline /tmp/h2h4b_ref_off/result.json /tmp/h2h4b_ours_off/result.json \
      --pair streaming /tmp/h2h4b_ref_str/result.json /tmp/h2h4b_ours_str/result.json \
      --pair chunk /tmp/h2h4b_ref_chunk/result.json /tmp/h2h4b_ours_chunk/result.json \
      --both vad /tmp/h2h4_vad/result.json \
      --both punc /tmp/h2h4_punc/result.json \
      --quick_ref /tmp/h2h_quick_ref/result.json \
      [--note "..."]

The headline phone/char CER keys come from the offline pair (the
reference's own headline family).
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--pair", nargs=3, action="append", default=[],
                   metavar=("FAMILY", "REF_JSON", "OURS_JSON"))
    p.add_argument("--both", nargs=2, action="append", default=[],
                   metavar=("TASK", "JSON"),
                   help="a shared-evaluator result holding both sides "
                        "(run_vad.py / run_punc.py output)")
    p.add_argument("--quick_ref", default=None,
                   help="reference result.json at the bench quick "
                        "setting (600 steps); exposes "
                        "quick_phone_cer_reference for "
                        "bench_headtohead_live")
    p.add_argument("--note", default="")
    args = p.parse_args(argv)

    merged = {"protocol": "examples/headtohead/README.md",
              "note": args.note, "families": {}}
    for family, ref_path, ours_path in args.pair:
        with open(ref_path) as f:
            ref = json.load(f)
        with open(ours_path) as f:
            ours = json.load(f)
        merged["families"][family] = {"reference": ref, "ours": ours}
        if family == "offline":          # headline keys (bench reads)
            merged["phone_cer_ours"] = float(ours["phone_cer"])
            merged["phone_cer_reference"] = float(ref["phone_cer"])
            merged["char_cer_ours"] = float(
                ours.get("txt_cer", ours.get("char_cer")))
            merged["char_cer_reference"] = float(
                ref.get("txt_cer", ref.get("char_cer")))
    for task, path in args.both:
        with open(path) as f:
            merged["families"][task] = json.load(f)
    if args.quick_ref:
        with open(args.quick_ref) as f:
            q = json.load(f)
        merged["quick_phone_cer_reference"] = float(q["phone_cer"])
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({k: v for k, v in merged.items()
                      if k != "families"}, indent=2))


if __name__ == "__main__":
    main()
