#!/usr/bin/env python3
"""Regenerate the per-row reference table in OPERATORS.md from SURVEY §2.

OPERATORS.md is the user-facing manual: an authored API tour at the top
(hand-maintained), then a generated cross-reference table mapping every
SURVEY §2 row (the coverage checklist) to its graft entry point and the
query/spec that verifies it. This script rewrites ONLY the part between
the GENERATED markers; everything above/below is kept verbatim.

Usage: python3 tools/gen_operators.py   (from the repo root)
"""
import re, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(ROOT, "SURVEY.md")
OUT = os.path.join(ROOT, "OPERATORS.md")
BEGIN = "<!-- BEGIN GENERATED (tools/gen_operators.py) -->"
END = "<!-- END GENERATED -->"

def clean(cell):
    # strip markdown emphasis/backticks are kept; collapse whitespace
    return re.sub(r"\s+", " ", cell.strip())

def parse_survey():
    lines = open(SURVEY, encoding="utf-8").read().splitlines()
    in_s2 = False
    section = None
    rows = []  # (section_title, row_id, deva_op, realization, where, status)
    for ln in lines:
        if ln.startswith("## "):
            in_s2 = ln.startswith("## §2")
            continue
        if not in_s2:
            continue
        if ln.startswith("### "):
            section = ln[4:].strip()
            continue
        m = re.match(r"^\| ([0-9]+[a-z0-9]*) \|", ln)
        if m:
            # §2.1/§2.2/§2.4 tables are 5-col (id, op, realization,
            # where, status); §2.3/§2.5–§2.7 are 4-col (no separate
            # realization). Escaped pipes inside a cell add splits, so
            # anchor on the ends: id first, status last, where
            # second-to-last, everything between is the description.
            cells = [clean(c) for c in ln.strip().strip("|").split("|")]
            if len(cells) >= 4:
                rows.append((section, cells[0],
                             " — ".join(c for c in cells[1:-2] if c),
                             cells[-2], cells[-1]))
    return rows

def shorten(s, n):
    return s if len(s) <= n else s[: n - 1].rstrip() + "…"

def gen_table(rows):
    out = []
    cur = None
    for section, rid, desc, where, status in rows:
        if section != cur:
            cur = section
            out.append("")
            out.append(f"### {section}")
            out.append("")
            out.append("| § row | op — Spark-first realization | entry point / verified by |")
            out.append("|---|---|---|")
        out.append(
            f"| {rid} | {shorten(desc, 200)} | {shorten(where, 120)} |")
    return "\n".join(out)

def main():
    rows = parse_survey()
    if len(rows) < 300:
        sys.exit(f"parsed only {len(rows)} rows from SURVEY §2 — aborting")
    doc = open(OUT, encoding="utf-8").read()
    if BEGIN not in doc or END not in doc:
        sys.exit("OPERATORS.md is missing the GENERATED markers")
    head, rest = doc.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    body = gen_table(rows)
    new = head + BEGIN + "\n" + body + "\n\n" + END + tail
    open(OUT, "w", encoding="utf-8").write(new)
    print(f"OPERATORS.md: regenerated {len(rows)} rows")

if __name__ == "__main__":
    main()
