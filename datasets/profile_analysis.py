"""Rank device ops in a ``jax.profiler`` trace by summed duration.

Works straight off the trace-event JSON (no TensorBoard needed):

    python datasets/profile_analysis.py <profile_dir> [--top 30] [--merge]

``<profile_dir>`` is the directory passed to ``jax.profiler.start_trace``
or ``Trainer(profile_dir=...)``; the script finds the newest
``plugins/profile/*/ *.trace.json.gz`` under it, selects the DEVICE process
(TPU/accelerator pid, identified from process_name metadata), and prints the
top event names by total duration with counts and mean time.

``--merge`` collapses XLA's numbered fusion suffixes (``fusion.123`` ->
``fusion``) so all instances of a fused producer family aggregate; the
default keeps exact names, which is what you want for "which single fusion
is the step's hot spot".
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(profile_dir: str) -> str:
    pats = [
        os.path.join(profile_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
    ]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
        if hits:
            break
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {profile_dir}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        return json.load(f)["traceEvents"]


def device_pids(events):
    """Pids whose process_name metadata looks like an accelerator device."""
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    dev = {
        pid
        for pid, name in pids.items()
        if re.search(r"TPU|device|/device:|Chip", name, re.I)
        and not re.search(r"host|CPU", name, re.I)
    }
    return dev or set(pids)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--merge", action="store_true",
                    help="collapse numbered fusion suffixes before ranking")
    args = ap.parse_args()

    path = find_trace(args.profile_dir)
    print(f"# trace: {path}", file=sys.stderr)
    events = load_events(path)
    dev = device_pids(events)

    total = collections.Counter()
    count = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "?")
        if args.merge:
            name = re.sub(r"\.\d+$", "", name)
        dur = float(e.get("dur", 0.0))  # microseconds
        total[name] += dur
        count[name] += 1
        wall += dur

    if not total:
        print("no device events found (wrong pid filter?)", file=sys.stderr)
        sys.exit(1)

    print(f"{'total_ms':>10} {'n':>6} {'mean_us':>9}  name   "
          f"(device busy total: {wall / 1e3:.2f} ms)")
    for name, dur in total.most_common(args.top):
        print(f"{dur / 1e3:10.3f} {count[name]:6d} "
              f"{dur / count[name]:9.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
