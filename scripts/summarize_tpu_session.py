#!/usr/bin/env python
"""Digest a scripts/tpu_session_r4.sh output directory into a markdown
block for BENCH.md: one row per measurement, rc + key line extracted.

Usage: python scripts/summarize_tpu_session.py [/tmp/tpu_r4]
"""
import json
import os
import re
import sys


def key_line(name: str, text: str) -> str:
    """The one line that carries the number, per measurement kind."""
    lines = [ln.strip() for ln in text.strip().splitlines() if ln.strip()]
    if not lines:
        return "(no output)"
    if name == "bench":
        for ln in reversed(lines):
            if ln.startswith("{") and '"metric"' in ln:
                try:
                    d = json.loads(ln)
                    return (f"{d['value']} {d['unit'].split(' (')[0]} "
                            f"(vs_baseline {d['vs_baseline']}"
                            + (f", per-call ≥ {d['value_per_call_lower_bound']}"
                               if "value_per_call_lower_bound" in d else "")
                            + (", ERROR: " + d["error"][:120]
                               if "error" in d else "") + ")")
                except json.JSONDecodeError:
                    pass
    if name.startswith("extractor"):
        for ln in reversed(lines):
            if "clips/sec" in ln:
                return ln
    if name.startswith("batcher"):
        for ln in reversed(lines):
            if "req/s" in ln or "requests" in ln:
                return ln
    if name == "bundle_smoke":
        for ln in reversed(lines):
            if "bundle_smoke" in ln:
                return ln
    for ln in reversed(lines):
        if re.search(r"\d", ln):
            return ln
    return lines[-1]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r4"
    session = os.path.join(out, "session.log")
    rcs = {}
    if os.path.exists(session):
        for ln in open(session):
            m = re.match(r"=== (\w+) rc=(\d+) \((\d+)s\)", ln)
            if m:
                rcs[m.group(1)] = (int(m.group(2)), int(m.group(3)))
    print(f"### TPU session digest ({out})\n")
    print("| measurement | rc | time | result |")
    print("|---|---|---|---|")
    for f in sorted(os.listdir(out)):
        if not f.endswith(".out"):
            continue
        name = f[:-4]
        rc, secs = rcs.get(name, ("?", "?"))
        text = open(os.path.join(out, f)).read()
        if (rc not in (0, "?")) or not text.strip():
            err = open(os.path.join(out, name + ".err")).read().strip()
            tail = (err or text).strip().splitlines()
            line = ("FAILED: " + tail[-1][:140]) if tail else "FAILED"
        else:
            line = key_line(name, text)
        print(f"| {name} | {rc} | {secs}s | {line} |")


if __name__ == "__main__":
    main()
