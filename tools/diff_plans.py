#!/usr/bin/env python
"""Diff two dump_plans.py outputs under nondeterminism normalization —
the mechanical source for _REWRITTEN_THIS_ROUND (r8 discipline, now a
committed tool instead of an ad-hoc snippet).

Normalizes the rendering noise that is NOT a plan change:
  * expression ids (``col#123`` -> ``col#N``)
  * lambda variable counters (``x_42`` -> ``x_N``)
  * scratch/temp paths (mkdtemp suffixes differ per run)
  * checkpoint/RDD object ids
  * grouping-set gid literals when only their numbering permutes

Usage: python tools/diff_plans.py before.json after.json
Prints one line per entry whose NORMALIZED plan differs (the rewrite
list), then a summary.
"""

from __future__ import annotations

import json
import re
import sys


def _canon_lists(s: str) -> str:
    """Canonicalize list ORDER inside a plan line: every bracketed
    group's top-level comma items are sorted (recursively). Grouping-set
    rewrites permute gid slot numbering, Expand projections, and
    Aggregate key/output order BETWEEN PROCESSES at the same commit
    (verified by double-dumping one commit) — list order in these
    operators is semantically irrelevant, so it must not count as a
    rewrite."""
    out, i, n = [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "[":
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "[":
                    depth += 1
                elif s[j] == "]":
                    depth -= 1
                j += 1
            inner = _canon_lists(s[i + 1 : j - 1])
            parts, buf, d = [], [], 0
            for c in inner:
                if c in "[(":
                    d += 1
                elif c in "])":
                    d -= 1
                if c == "," and d == 0:
                    parts.append("".join(buf).strip())
                    buf = []
                else:
                    buf.append(c)
            parts.append("".join(buf).strip())
            out.append("[" + ", ".join(sorted(parts)) + "]")
            i = j
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _blank_gid_slots(line: str) -> str:
    """Blank ONLY the gid/tag slots of each Expand projection — the
    elements that are ENTIRELY a bare integer (delimiter-bounded).
    Grouping-set gid tags trail the projection; pivot/multi-agg Expand
    shapes LEAD with the tag (same-HEAD double-dump control caught the
    leading case). An integer inside an expression (``(a#N + 5)``) has
    non-delimiter neighbors and is untouched, so a rewrite that only
    changes a real literal still counts (r9 ADVICE: the old blanket
    blanking masked exactly that)."""
    return re.sub(r"(?<=[\[,])\s*\d+\s*(?=[\],])", " G", line)


def normalize(plan: str, audit: list[str] | None = None) -> str:
    """``audit``, when given, collects a one-line record of every
    canonicalization applied to Aggregate/Expand lines so false
    negatives are inspectable (r9 ADVICE)."""
    p = plan
    p = re.sub(r"#\d+L?", "#N", p)  # expression ids
    # physical plan_id counters (r16: Exchange/Subquery reuse markers
    # carry a session-global counter — rendering noise, not a plan
    # change; two same-code dumps differ in it whenever earlier entries
    # planned a different number of nodes)
    p = re.sub(r"plan_id=\d+", "plan_id=N", p)
    # Lambda-variable counters ONLY (r9 ADVICE: the old blanket
    # `name_\d+` collapsed distinct real columns like col_1/col_2).
    # Spark renders higher-order-function variables as `<arg>_<n>#id`;
    # this repo's lambda args are all <=3 lowercase chars (x, y, s, i,
    # acc, tok, ...), and no real column matches that shape — audited
    # by the canonicalization log below if one ever does.
    p = re.sub(r"\b([a-z]{1,3})_\d+(?=#N)", r"\1_N", p)
    p = re.sub(r"/tmp/[A-Za-z0-9_./-]+", "/TMP", p)  # scratch paths
    p = re.sub(r"/private/var/[A-Za-z0-9_./-]+", "/TMP", p)
    p = re.sub(r"ExistingRDD\[[^\]]*\]", "ExistingRDD[NORM]", p)
    p = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", p)
    p = re.sub(r"spark_grouping_id#N", "gid#N", p)
    # grouping-set gid literals permute with the (nondeterministic)
    # internal distinct-group numbering; the literal value is an
    # internal tag, not a plan property
    p = re.sub(r"gid#N = \d+", "gid#N = G", p)
    lines = []
    for ln in p.splitlines():
        if "Aggregate [" in ln or "Expand [" in ln:
            # list ORDER in these operators permutes between processes
            # (same-commit double-dump control); Expand additionally
            # carries permuting gid slot VALUES. Sort lists; blank the
            # gid slots only (never other integers).
            canon = _canon_lists(
                _blank_gid_slots(ln) if "Expand [" in ln else ln
            )
            if canon != ln and audit is not None:
                audit.append(ln.strip()[:160])
            lines.append(canon)
        else:
            lines.append(ln)
    return "\n".join(lines)


def main() -> int:
    with open(sys.argv[1]) as fh:
        before = json.load(fh)
    with open(sys.argv[2]) as fh:
        after = json.load(fh)
    changed, added, removed = [], [], []
    audit: list[str] = []
    for name in sorted(set(before) | set(after)):
        if name not in before:
            added.append(name)
        elif name not in after:
            removed.append(name)
        elif normalize(before[name], audit) != normalize(after[name], audit):
            changed.append(name)
    if audit:
        print(
            f"[canonicalized {len(audit)} Aggregate/Expand lines — "
            "false-negative audit trail]",
            file=sys.stderr,
        )
        for ln in audit:
            print(f"  canon: {ln}", file=sys.stderr)
    for n in changed:
        print(f"REWRITTEN {n}")
    for n in added:
        print(f"NEW       {n}")
    for n in removed:
        print(f"REMOVED   {n}")
    print(
        f"-- {len(changed)} rewritten, {len(added)} new, {len(removed)} removed, "
        f"{len(set(before) & set(after)) - len(changed)} unchanged"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
