#!/usr/bin/env python3
"""Scaling-exponent table for SURVEY §6: reads the base (sf0.1) and x10
bench JSONs and prints per-query wall-times with the fitted exponent
e = log(t10/t1) / log(10)  (t ∝ n^e between the two measured points).
Usage: scale_exponents.py BENCH_scale_base_r09.json BENCH_scale_x10_r09.json
"""
import json, math, sys

base = json.load(open(sys.argv[1]))
x10 = json.load(open(sys.argv[2]))
qs = sorted(set(base["queries"]) & set(x10["queries"]))
print(f"| Query | sf0.1 (s) | x10 (s) | ratio | exponent |")
print("| --- | --- | --- | --- | --- |")
tot1 = tot10 = 0.0
for q in qs:
    t1, t10 = base["queries"][q], x10["queries"][q]
    tot1 += t1; tot10 += t10
    r = t10 / t1
    e = math.log(r) / math.log(10)
    print(f"| {q} | {t1:.2f} | {t10:.2f} | {r:.1f}x | {e:.2f} |")
r = tot10 / tot1
print(f"| **total** | {tot1:.1f} | {tot10:.1f} | {r:.1f}x | "
      f"{math.log(r)/math.log(10):.2f} |")
