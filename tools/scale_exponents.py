#!/usr/bin/env python3
"""Scaling exponents from two filtered Bench runs over the same query
list at data-size ratio R: alpha = ln(t_big/t_small) / ln(R).

Usage: python3 tools/scale_exponents.py <base.json> <scaled.json> [R=5]

alpha ~ 1 = linear in data; << 1 = fixed-overhead floor dominates;
> 1 = super-linear (needs a disposition).
"""
import json
import math
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    # filtered Bench lists can diverge between runs: compare only the
    # shared keys, and say so instead of dying mid-table (r12 ADVICE)
    common = sorted(set(base["queries"]) & set(scaled["queries"]))
    asym = sorted(set(base["queries"]) ^ set(scaled["queries"]))
    if asym:
        print(f"WARNING: {len(asym)} queries in only one run, skipped: "
              f"{', '.join(asym)}", file=sys.stderr)
    print(f"{'query':34s} {'base_s':>8s} {'5x_s':>8s} {'ratio':>6s} {'alpha':>6s}")
    for q in common:
        b, s = base["queries"][q], scaled["queries"][q]
        if b <= 0:
            print(f"{q:34s} {b:8.2f} {s:8.2f}  (base <= 0s, alpha undefined)")
            continue
        ratio = s / b
        alpha = math.log(ratio) / math.log(r)
        print(f"{q:34s} {b:8.2f} {s:8.2f} {ratio:6.2f} {alpha:6.2f}")


if __name__ == "__main__":
    main()
