#!/usr/bin/env python3
"""Benchmark comparison chart — the rendered analogue of the reference
repo's src/clickhouse.ipynb matplotlib cells, generated from the same
committed artifacts BENCH_TRENDS.md tabulates (the table view of this
chart). Emits BENCH_CHART.svg with two panels:

  A. headline throughput vs corpus size (log-log): the four reference
     benchmark queries at sf0.1 / 16x / 64x, with the reference's
     published 1.1B-row rates as open markers — the honest comparison
     is rate-vs-scale, since absolute latencies at different row
     counts are not comparable and fixed per-job overhead dominates
     the small end (the rising lines ARE the amortization story);
  B. the q1-q4 headline sum by round — the only total comparable
     across rounds (the full lane set grew every round).

Usage: python3 tools/bench_chart.py    (writes BENCH_CHART.svg)
Pure stdlib. Colors: validated 2..4-slot categorical palette (blue,
orange, aqua, yellow) on the light surface; yellow's <3:1 contrast is
relieved by direct labels per the relief rule.
"""
import glob
import json
import math
import os
import re
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_ROWS = 1_100_000_000
SF01_ROWS = 600_000
REF_LOCAL = {
    "q1_count_by_flag": 1.15206,
    "q2_avg_by_status": 3.59093,
    "q3_count_by_flag_year": 5.62999,
    "q4_count_3key_sorted": 8.74989,
}
HEADLINE = list(REF_LOCAL)
SHORT = {q: q.split("_")[0] for q in HEADLINE}

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e8e7e3"
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]


def parse_bench(path):
    with open(path) as f:
        j = json.load(f)
    if "queries" in j:
        return j["queries"]
    for line in j.get("tail", "").splitlines():
        if line.startswith("{"):
            try:
                return json.loads(line).get("queries", {})
            except ValueError:
                continue
    return {}


def round_close_sums():
    """Headline sums per round, mined from the round-close commits'
    bench_result.json (the driver tags each close 'round N: verdict/…');
    the BENCH_r{N}.json tails are truncated for several rounds, the
    committed artifact never is. Falls back to the driver artifacts
    when git is unavailable."""
    rounds = []
    try:
        log = subprocess.run(
            ["git", "-C", ROOT, "log", "--format=%H %s"],
            capture_output=True, text=True, check=True).stdout
        for line in log.splitlines():
            m = re.match(r"(\w+) round (\d+): verdict", line)
            if not m:
                continue
            blob = subprocess.run(
                ["git", "-C", ROOT, "show",
                 f"{m.group(1)}:bench_result.json"],
                capture_output=True, text=True)
            if blob.returncode != 0:
                continue
            q = json.loads(blob.stdout).get("queries", {})
            if all(q.get(h, -1) >= 0 for h in HEADLINE):
                rounds.append((int(m.group(2)),
                               sum(q[h] for h in HEADLINE)))
    except (OSError, subprocess.CalledProcessError, ValueError):
        pass
    if not rounds:
        for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
            m = re.search(r"BENCH_r(\d+)\.json$", p)
            q = parse_bench(p)
            if m and all(q.get(h, -1) >= 0 for h in HEADLINE):
                rounds.append((int(m.group(1)),
                               sum(q[h] for h in HEADLINE)))
    return [(f"r{n}", v) for n, v in sorted(rounds)]


def main():
    # round-over-round headline sums (panel B)
    rounds = round_close_sums()
    local = parse_bench(os.path.join(ROOT, "bench_result.json"))
    if all(local.get(h, -1) >= 0 for h in HEADLINE):
        rounds.append(("now", sum(local[h] for h in HEADLINE)))

    # throughput points (panel A): (rows, Mrows/s) per headline query
    def latest(pat):
        ps = sorted(glob.glob(os.path.join(ROOT, pat)))
        return json.load(open(ps[-1])) if ps else None
    s16 = latest("SCALE_r*.json")
    s64 = latest("SCALE64_r*.json")
    pts = {h: [] for h in HEADLINE}
    for h in HEADLINE:
        if local.get(h, -1) > 0:
            pts[h].append((SF01_ROWS, SF01_ROWS / local[h] / 1e6))
        for s in (s16, s64):
            if s and h in s.get("queries", {}):
                rows = s["rows_lineitem_k"]
                pts[h].append((rows, rows / s["queries"][h]["k"] / 1e6))

    W, H = 980, 440
    out = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
           f'height="{H}" viewBox="0 0 {W} {H}" font-family="Helvetica,'
           f'Arial,sans-serif">',
           f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>']

    def text(x, y, s, size=11, fill=INK2, anchor="start", weight="normal"):
        out.append(f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size}" '
                   f'fill="{fill}" text-anchor="{anchor}" '
                   f'font-weight="{weight}">{s}</text>')

    def spread(ys, gap=13.0):
        """Nudge label y-positions apart so none overlap (stable order)."""
        order = sorted(range(len(ys)), key=lambda i: ys[i])
        for a, b in zip(order, order[1:]):
            if ys[b] - ys[a] < gap:
                ys[b] = ys[a] + gap
        return ys

    # ---- panel A: throughput vs scale (log-log) ------------------------
    ax, ay, aw, ah = 64, 72, 420, 280
    x0, x1 = math.log10(4e5), math.log10(2e9)
    y0, y1 = math.log10(0.5), math.log10(2000)

    def X(r): return ax + (math.log10(r) - x0) / (x1 - x0) * aw
    def Y(t): return ay + ah - (math.log10(t) - y0) / (y1 - y0) * ah

    text(ax, 24, "Headline throughput vs corpus size", 13, INK,
         weight="bold")
    text(ax, 40, "Mrows/s (log), sf0.1 / 16x / 64x corpora; "
         "open diamonds: reference at 1.1B rows", 10.5)
    # legend: series chips + the two marker shapes (engine identity)
    lx = ax
    for i, h in enumerate(HEADLINE):
        out.append(f'<rect x="{lx}" y="49" width="10" height="10" rx="2" '
                   f'fill="{SERIES[i]}"/>')
        text(lx + 14, 58, SHORT[h], 11)
        lx += 46
    out.append(f'<circle cx="{lx + 5}" cy="54" r="4" fill="{INK2}"/>')
    text(lx + 13, 58, "this engine", 11)
    lx += 86
    out.append(f'<path d="M {lx + 5} 49 L {lx + 10} 54 L {lx + 5} 59 '
               f'L {lx} 54 Z" fill="{SURFACE}" stroke="{INK2}" '
               f'stroke-width="2"/>')
    text(lx + 15, 58, "reference", 11)
    for t in (1, 10, 100, 1000):
        y = Y(t)
        out.append(f'<line x1="{ax}" y1="{y:.1f}" x2="{ax + aw}" '
                   f'y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>')
        text(ax - 6, y + 3.5, str(t), anchor="end")
    for r, lbl in ((6e5, "600k"), (9.6e6, "9.6M"), (3.84e7, "38M"),
                   (1.1e9, "1.1B")):
        x = X(r)
        out.append(f'<line x1="{x:.1f}" y1="{ay + ah}" x2="{x:.1f}" '
                   f'y2="{ay + ah + 4}" stroke="{INK2}" stroke-width="1"/>')
        text(x, ay + ah + 16, lbl, anchor="middle")
    text(ax + aw / 2, ay + ah + 32, "rows (log)", anchor="middle")
    for i, h in enumerate(HEADLINE):
        c = SERIES[i]
        p = pts[h]
        if len(p) >= 2:
            d = " ".join(f"{X(r):.1f},{Y(t):.1f}" for r, t in p)
            out.append(f'<polyline points="{d}" fill="none" stroke="{c}" '
                       f'stroke-width="2"/>')
        for r, t in p:
            out.append(f'<circle cx="{X(r):.1f}" cy="{Y(t):.1f}" r="4" '
                       f'fill="{c}" stroke="{SURFACE}" stroke-width="2"/>')
        # reference marker (open diamond, same hue = same query)
        xr, yr = X(REF_ROWS), Y(REF_ROWS / REF_LOCAL[h] / 1e6)
        out.append(f'<path d="M {xr:.1f} {yr - 5:.1f} L {xr + 5:.1f} '
                   f'{yr:.1f} L {xr:.1f} {yr + 5:.1f} L {xr - 5:.1f} '
                   f'{yr:.1f} Z" fill="{SURFACE}" stroke="{c}" '
                   f'stroke-width="2"/>')
    # direct labels, collision-nudged: at each line's 64x end and at
    # each reference diamond (same hue both sides of the gap)
    endy = spread([Y(pts[h][-1][1]) + 3.5 for h in HEADLINE if pts[h]])
    for (h, y) in zip([h for h in HEADLINE if pts[h]], endy):
        text(X(pts[h][-1][0]) + 8, y, SHORT[h], 11, INK)
    refy = spread([Y(REF_ROWS / REF_LOCAL[h] / 1e6) + 3.5
                   for h in HEADLINE])
    for h, y in zip(HEADLINE, refy):
        text(X(REF_ROWS) - 8, y, SHORT[h], 11, INK, anchor="end")

    # ---- panel B: headline sum by round --------------------------------
    bx, by, bw, bh = 590, 72, 340, 280
    text(bx, 24, "Headline sum by round (q1-q4, seconds)", 13, INK,
         weight="bold")
    text(bx, 40, "sf0.1, lower is better; the only cross-round "
         "comparable total", 10.5)
    if rounds:
        vmax = max(v for _, v in rounds) * 1.25
        n = len(rounds)
        def BX(i): return bx + (i + 0.5) / n * bw
        def BY(v): return by + bh - v / vmax * bh
        step = max(1, int(vmax / 4))
        t = step
        while t < vmax:
            y = BY(t)
            out.append(f'<line x1="{bx}" y1="{y:.1f}" x2="{bx + bw}" '
                       f'y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>')
            text(bx - 6, y + 3.5, str(t), anchor="end")
            t += step
        d = " ".join(f"{BX(i):.1f},{BY(v):.1f}"
                     for i, (_, v) in enumerate(rounds))
        out.append(f'<polyline points="{d}" fill="none" '
                   f'stroke="{SERIES[0]}" stroke-width="2"/>')
        lo = min(range(n), key=lambda i: rounds[i][1])
        for i, (lbl, v) in enumerate(rounds):
            out.append(f'<circle cx="{BX(i):.1f}" cy="{BY(v):.1f}" r="4" '
                       f'fill="{SERIES[0]}" stroke="{SURFACE}" '
                       f'stroke-width="2"/>')
            text(BX(i), by + bh + 16, lbl, anchor="middle")
            if i in (0, n - 1, lo):  # selective direct labels
                text(BX(i), BY(v) - 10, f"{v:.2f}", 11, INK,
                     anchor="middle")
    out.append(f'<line x1="{bx}" y1="{by + bh}" x2="{bx + bw}" '
               f'y2="{by + bh}" stroke="{INK2}" stroke-width="1"/>')
    out.append(f'<line x1="{ax}" y1="{ay + ah}" x2="{ax + aw}" '
               f'y2="{ay + ah}" stroke="{INK2}" stroke-width="1"/>')
    text(ax, H - 14, "Table view: BENCH_TRENDS.md - generated by "
         "tools/bench_chart.py from BENCH_r*.json / bench_result.json / "
         "SCALE*_r*.json", 10.5)
    out.append("</svg>")

    path = os.path.join(ROOT, "BENCH_CHART.svg")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rounds)} rounds, "
          f"{sum(len(v) for v in pts.values())} throughput points)")


if __name__ == "__main__":
    main()
