"""Render the docs/PERFORMANCE.md results table from benchmarks/results.json.

One source of truth: the suite writes results.json; this script rewrites the
region of docs/PERFORMANCE.md between the GENERATED markers from it (plus
BENCH_r*.json headline lines when present), so the prose can never drift
from the measured artifacts again.

Run:  python benchmarks/report.py [--check]
--check exits non-zero if the doc is stale instead of rewriting it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DOC = os.path.join(REPO, "docs", "PERFORMANCE.md")
BEGIN = "<!-- BEGIN GENERATED RESULTS (benchmarks/report.py) -->"
END = "<!-- END GENERATED RESULTS -->"

_LABELS = {
    "cpu_parity_720p": "720p `--cpu` parity flow (full map/frame)",
    "fused_720p_80px": "720p fused, 80x80 template",
    "batch_4_720p": "720p batch (`--batch=4`)",
    "batch_8_720p": "720p batch (`--batch=8`)",
    "batch_16_720p": "720p batch (`--batch=16`)",
    "batch_32_720p": "720p batch (`--batch=32`)",
    "1080p_r160": "1080p, radius 160",
    "4k_r160": "4K, radius 160",
    "pallas_720p_80px": "720p Pallas kernel (`--shared/--const/--const_tiled`)",
    "mode_cpu_720p": "mode `--cpu` (TM_CCOEFF_NORMED full map)",
    "mode_cuda_720p": "mode `--cuda`/naive (MXU matmul engine, HIGHEST)",
    "mode_fast_720p": "mode `--fast` (matmul engine, precision=HIGH)",
    "mode_shared_720p": "mode `--shared/--const/--const_tiled` (Pallas)",
}


def _label(rec):
    cfg = rec["config"]
    if cfg in _LABELS:
        return _LABELS[cfg]
    m = re.match(r"multi_object_(\d+)x_720p", cfg)
    if m:
        return f"{m.group(1)} objects / frame (vmap)"
    m = re.match(r"multi_stream_(\d+)x_batch(\d+)_720p", cfg)
    if m:
        return f"{m.group(1)} streams x batch {m.group(2)}"
    m = re.match(r"multi_stream_(\d+)x_720p", cfg)
    if m:
        return f"{m.group(1)} independent streams (serving)"
    return cfg


def _fmt_fps(v):
    return f"{v:,.0f}"


def render() -> str:
    with open(os.path.join(HERE, "results.json")) as f:
        results = json.load(f)
    meta = next((r["_meta"] for r in results if "_meta" in r), "")
    results = [r for r in results if "_meta" not in r]

    lines = [BEGIN, ""]
    headlines = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    for p in headlines:
        try:
            with open(p) as f:
                rec = json.load(f)
            inner = rec.get("parsed") or rec
            if isinstance(inner, dict) and "value" in inner:
                lines.append(
                    f"Driver headline ({os.path.basename(p)}): "
                    f"**{_fmt_fps(inner['value'])} {inner.get('unit', '')}**, "
                    f"{inner.get('vs_baseline', '?')}x baseline."
                )
        except Exception:
            continue
    if len(lines) > 2:
        lines.append("")

    lines.append("| Config | FPS | vs reference | Notes |")
    lines.append("|---|---:|---:|---|")
    for rec in results:
        if "value" not in rec:  # skipped/error records carry no measurement
            continue
        notes = []
        if "max_l1_err_px" in rec:
            notes.append(f"{rec['max_l1_err_px']} px trajectory error")
        if "object_rate" in rec:
            notes.append(f"{_fmt_fps(rec['object_rate'])} object-updates/s")
        if "aggregate_fps" in rec:
            notes.append(f"**{_fmt_fps(rec['aggregate_fps'])} aggregate FPS**")
        if "parity_max_abs_err_vs_matmul" in rec:
            notes.append(
                f"on-device parity vs matmul engine: "
                f"{rec['parity_max_abs_err_vs_matmul']:.1e} max abs err"
            )
        if "mfu_f32_highest_pct" in rec:
            notes.append(
                f"{rec['achieved_tflops']} TFLOP/s = "
                f"{rec['mfu_f32_highest_pct']}% of f32-HIGHEST peak"
            )
        if "batch" in rec.get("config", "") and "batch_" in rec["config"]:
            notes.append("parity semantics (one update/batch)")
        lines.append(
            f"| {_label(rec)} | {_fmt_fps(rec['value'])} | "
            f"{rec['vs_baseline']}x | {'; '.join(notes)} |"
        )
    lines.append("")
    if meta:
        lines.append(f"_{meta}_")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    block = render()
    with open(DOC) as f:
        doc = f.read()
    if BEGIN not in doc or END not in doc:
        print(f"markers missing in {DOC}", file=sys.stderr)
        return 1
    new_doc = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END), block, doc, flags=re.S
    )
    if args.check:
        if new_doc != doc:
            print("docs/PERFORMANCE.md is stale; run benchmarks/report.py")
            return 1
        print("docs/PERFORMANCE.md is in sync")
        return 0
    with open(DOC, "w") as f:
        f.write(new_doc)
    print(f"rewrote generated block in {DOC}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
