"""Analyze burst-forensics logs (docs/PERF.md open collapse trigger).

Reads one or more work dirs' ``burst_log.jsonl`` (written by
train/loop.py's drain of AgentState.burst_log: for each TD-gate firing
chunk, the FIRST flagged minibatch's replay provenance — slot indices,
slot write ordinals — plus per-sample TD errors, and every guard-rollback
event) and prints, per burst:

  * the flagged batch's TD-error tail (how many samples actually carry the
    anomaly — a single rogue sample vs a broad batch shift);
  * the slot-age distribution of the top-TD samples vs the whole batch
    (tail-of-distribution-transitions hypothesis: flagged samples should
    skew OLD or not at all);
  * slot concentration (one poisoned episode slot vs spread);
  * rollback proximity: whether the flagged slots were written within one
    episode of a guard rollback's ring rebuild (boundary hypothesis).

Usage: python scripts/analyze_bursts.py <work_dir_or_jsonl> [...]
"""

import json
import os
import sys

import numpy as np


def analyze(path: str):
    fp = (path if path.endswith(".jsonl")
          else os.path.join(path, "burst_log.jsonl"))
    if not os.path.exists(fp):
        print(f"{fp}: absent (no gate firings recorded)")
        return
    rollbacks = []
    print(f"== {fp}")
    for line in open(fp):
        rec = json.loads(line)
        if rec["type"] == "rollback":
            rollbacks.append(rec)
            print(f"  [rollback #{rec['rollback']}] at step {rec['at_step']} "
                  f"-> {rec['to_step']} (detected reward "
                  f"{rec['detected_reward']:.1f}, ring ep_counter "
                  f"{rec['ring_ep_counter']})")
            continue
        td = np.maximum(np.abs(np.asarray(rec["td1"])),
                        np.abs(np.asarray(rec["td2"])))
        ages = np.asarray(rec["age_eps"])
        ep_i = np.asarray(rec["ep_i"])
        order = np.argsort(td)[::-1]
        k = max(4, len(td) // 16)  # the top ~6% TD tail
        top = order[:k]
        top_slots, top_counts = np.unique(ep_i[top], return_counts=True)
        # rollback proximity: slots written within 1 completed episode of
        # the post-rollback ring state (age ~= ep_counter at burst minus
        # rollback ring counter)
        last_rb = rec.get("last_rollback")
        rb_note = "no prior rollback"
        if last_rb:
            since = rec["ring_ep_counter"] - last_rb["ring_ep_counter"]
            slot_ep = np.asarray(rec["slot_ep"])
            boundary = slot_ep[top] <= last_rb["ring_ep_counter"] + 1
            rb_note = (f"{int(boundary.sum())}/{k} top-TD slots written at/"
                       f"before the rollback-rebuild boundary "
                       f"({since} eps since rollback to "
                       f"{last_rb['to_step']})")
        print(f"  [burst] update {rec['update_step']} (chunk "
              f"{rec['chunk_step']}): td p50/p95/max = "
              f"{np.percentile(td, 50):.1f}/{np.percentile(td, 95):.1f}/"
              f"{td.max():.1f}; "
              f"age mean(batch)={ages.mean():.1f} vs mean(topTD)="
              f"{ages[top].mean():.1f} eps; "
              f"top-TD slot spread: {len(top_slots)} slots "
              f"(max {int(top_counts.max())}/{k} in slot "
              f"{int(top_slots[top_counts.argmax()])}); {rb_note}")
    if not rollbacks:
        print("  (no rollbacks)")


if __name__ == "__main__":
    for p in sys.argv[1:] or ["."]:
        analyze(p)
