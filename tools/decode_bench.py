#!/usr/bin/env python3
"""Decode the compact bench line's front-coded "qs" field.

Usage: decode_bench.py BENCH_r07.json   (or any file whose last line is the
compact JSON; tolerates a tail-truncated front — entries before the first
fully-contained one are dropped, matching the driver's stdout capture).

Entry format: B36(L) + suffix + ":" + value, where L is the number of
leading chars shared with the PREVIOUS entry's name (name = prev[:L] +
suffix); values are integers in the line's "q_unit" (cs = centiseconds,
ds = deciseconds; negative = failed run).
"""
import json, sys

B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def decode(qs: str, unit: str) -> dict:
    div = {"cs": 100.0, "ds": 10.0}[unit]
    prev, out = "", {}
    for e in qs.split(","):
        if not e:
            continue
        cut = e.rfind(":")
        l = B36.index(e[0])
        if l > len(prev):  # truncated head: this entry's prefix is lost
            continue
        name = prev[:l] + e[1:cut]
        out[name] = int(e[cut + 1:]) / div
        prev = name
    return out


if __name__ == "__main__":
    line = open(sys.argv[1]).read().strip().splitlines()[-1]
    d = json.loads(line[line.index("{"):]) if "{" in line else {}
    q = decode(d.get("qs", ""), d.get("q_unit", "cs"))
    print(json.dumps({**{k: v for k, v in d.items() if k != "qs"}, "queries": q},
                     indent=None, sort_keys=True))
