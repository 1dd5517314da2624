#!/usr/bin/env python3
"""Aggregate SPARK_GRAFT_ROUND_DEBUG=1 stderr marks into a per-phase
attribution table (VERDICT r6 #6: where do crawl_replay's seconds go).

Input: a log containing lines like `[round 3] pb_sched 0.41s`.
Output: one row per phase: total seconds, share, per-round mean, and
the round count — i.e. rounds x per-round fixed cost, attributed.
"""
import re
import sys
from collections import defaultdict

phase_tot = defaultdict(float)
phase_n = defaultdict(int)
rounds = set()
pat = re.compile(r"\[round (\d+)\] (\S+) ([0-9.]+)s")
text = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
for m in pat.finditer(text):
    rnd, phase, sec = int(m.group(1)), m.group(2), float(m.group(3))
    rounds.add(rnd)
    phase_tot[phase] += sec
    phase_n[phase] += 1

total = sum(phase_tot.values())
print(f"rounds={len(rounds)} marked_total={total:.2f}s")
print(f"{'phase':<16}{'total_s':>9}{'share':>8}{'mean_s/round':>14}{'n':>5}")
for ph, tot in sorted(phase_tot.items(), key=lambda kv: -kv[1]):
    print(f"{ph:<16}{tot:9.2f}{tot/total:8.1%}{tot/max(1,phase_n[ph]):14.3f}{phase_n[ph]:5d}")
