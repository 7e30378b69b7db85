"""Live training dashboard — terminal + PNG equivalent of the reference's
PyQt5 reward windows (reference: src/utils.py:348-489 `RewardDashboard`
Qt widgets polling the run; headless TPU pods have no display, so this
tails the JSONL train log instead and renders both a console sparkline
and a refreshing PNG plot).

    python scripts/dashboard.py logs/walker_walk/sgsac/0/train.log
    python scripts/dashboard.py <log> --png /tmp/dash.png --interval 10
"""

import argparse
import json
import os
import sys
import time

_BLOCKS = " ▁▂▃▄▅▆▇█"


def _spark(values, width=60):
    if not values:
        return ""
    v = values[-width:]
    lo, hi = min(v), max(v)
    rng = (hi - lo) or 1.0
    return "".join(_BLOCKS[1 + int(7 * (x - lo) / rng)] for x in v)


def _read(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # mid-write tail
    return rows


def _render_png(rows, out):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    steps = [r["step"] for r in rows]
    rewards = [r["episode_reward"] for r in rows]
    fig, ax = plt.subplots(figsize=(7, 4), dpi=110, facecolor="#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    ax.plot(steps, rewards, color="#2a78d6", lw=1.5)
    ax.set_xlabel("step", color="#0b0b0b")
    ax.set_ylabel("episode reward", color="#0b0b0b")
    ax.spines[["top", "right"]].set_visible(False)
    ax.grid(axis="y", color="#52514e", alpha=0.15, lw=0.7)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return True


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log", help="path to a train.log (JSONL)")
    p.add_argument("--png", default="", help="also refresh a PNG plot here")
    p.add_argument("--interval", type=float, default=5.0)
    p.add_argument("--once", action="store_true", help="print once and exit")
    args = p.parse_args()

    last_n = 0
    while True:
        if os.path.exists(args.log):
            rows = _read(args.log)
            if rows and len(rows) != last_n:
                last_n = len(rows)
                r = rows[-1]
                rewards = [x["episode_reward"] for x in rows]
                line = (
                    f"step {r['step']:>9,} | ep {int(r.get('episode', 0)):>5} "
                    f"| R {r['episode_reward']:8.1f} "
                    f"| {_spark(rewards)}"
                )
                print(line, flush=True)
                if args.png:
                    _render_png(rows, args.png)
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
