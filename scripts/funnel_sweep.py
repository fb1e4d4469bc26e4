"""Registry-wide window-funnel sweep (VERDICT r7 item 3).

Walks the executed plan of EVERY registry key and flags any window
whose partition spec is empty or a known low-cardinality column —
those windows serialize corpus-grain rows into one task (parallelism
caps at |keys| no matter the cluster) — UNLESS the window is provably
bounded:

- partitioned by the distributed primitives' ``__pid`` (the local
  pass of distributed_rank/cumsum/lag: one window per range
  partition),
- referencing the primitives' tiny per-(key, partition) offset table
  columns (``__ptot``/``__pcnt``),
- an upstream aggregate sits in the window's input subtree (the
  window then runs on aggregate grain — days, vocab terms, buckets —
  not raw corpus rows), or
- the (key, partition-col) pair carries an explicit whitelist reason
  below.

Shared by ``tests/test_scale_paths.py::test_registry_wide_funnel_sweep``
and runnable standalone::

    python scripts/funnel_sweep.py [key ...]        # live plans (slow)
    python scripts/funnel_sweep.py --plans PLANS.md # pinned plans (<10 s)

The ``--plans`` fast path scans the formatted-explain texts pinned in
PLANS.md instead of rebuilding 481 live plans, so plan smells surface
in seconds on every commit; the live-plan pytest stays the round-close
gate (pinned texts can lag the code).
"""

from __future__ import annotations

import re

# Columns whose cardinality does NOT grow with the corpus: a window
# partitioned by one of these over raw (non-aggregated) rows is a
# funnel. Aliases the query layer introduces (t, k, lang, label...)
# are included; corpus-scaled ids (user/order/doc/bucket ids) are not.
LOW_CARD_COLS = frozenset({
    "event_type", "type", "t", "source", "lang", "language",
    "label", "segment", "priority", "o_orderpriority", "c_mktsegment",
    "n_name", "r_name", "p_brand", "p_type", "p_container", "p_mfgr",
    "o_orderstatus", "l_returnflag", "l_linestatus", "l_shipmode",
    "l_shipinstruct", "band", "quality_bucket", "month", "dow", "hour",
    "year", "k", "grp", "split", "shard", "tile", "cls", "class",
})

# (key, partition-head) pairs allowed to keep a low-cardinality/global
# window with an inline justification. Keep this SHORT — the right fix
# is almost always distributed_rank/cumsum/lag; a whitelist entry must
# say why the frame is bounded WITHOUT an aggregate visible in the
# subtree (e.g. the input is a staged/checkpointed aggregate whose
# lineage the plan string no longer shows).
WHITELIST: dict[tuple[str, str], str] = {
}

_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def _split_top(args: str) -> list[str]:
    """Split a windowspecdefinition arg string on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _partition_cols(spec_args: str) -> list[str]:
    """Partition columns of one windowspecdefinition arg list: the
    top-level args before the first ordered arg (``... ASC/DESC NULLS
    ...``) or the frame spec."""
    cols = []
    for a in _split_top(spec_args):
        if a.startswith("specifiedwindowframe"):
            break
        if re.search(r"\b(ASC|DESC) NULLS", a):
            break
        cols.append(a)
    return cols


def _spec_args(line: str, start: int) -> str:
    """The balanced arg substring of windowspecdefinition( at start."""
    i = line.index("(", start)
    depth, j = 0, i
    for j in range(i, len(line)):
        if line[j] == "(":
            depth += 1
        elif line[j] == ")":
            depth -= 1
            if depth == 0:
                break
    return line[i + 1:j]


def _col_name(expr: str) -> str:
    """Base column name of a partition expression (``t#12`` -> ``t``,
    ``cast(x#3 as int)`` -> its first referenced column)."""
    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", expr)
    return m.group(1) if m else expr


def _node_indent(line: str) -> int:
    """Tree depth of a plan line. Marker lines get their ``+-``/``:-``
    offset + 2 (so a first-level child reads 2); root lines (no
    marker) read 0, so a following sibling root line terminates a
    subtree scan instead of the scan walking the whole remaining plan.
    The marker match is anchored to the tree-drawing prefix (spaces and
    ``:`` continuation bars only) — a ``:-`` inside an expression
    string must not yield a bogus depth."""
    m = re.match(r"[ :]*([+:]-)", line)
    return m.start(1) + 2 if m else 0


def scan_plan(plan: str) -> list[dict]:
    """All windowspecdefinition sites in an executed-plan string with
    their partition heads and whether an aggregate feeds them."""
    lines = plan.splitlines()
    sites = []
    for i, line in enumerate(lines):
        if "windowspecdefinition" not in line:
            continue
        indent = _node_indent(lines[i])
        # input subtree: following lines strictly deeper in the tree
        has_agg = False
        has_group_limit = False
        for nxt in lines[i + 1:]:
            d = _node_indent(nxt)
            if d <= indent:
                break
            if "WindowGroupLimit" in nxt:
                # a rank<=k filter Spark rewrote into map-side top-k
                # pruning: only k rows per group per input partition
                # reach the window — bounded, not corpus grain
                has_group_limit = True
                break
            if any(a in nxt for a in _AGG_NODES):
                has_agg = True
                break
        for m in re.finditer(r"windowspecdefinition\(", line):
            args = _spec_args(line, m.start())
            pcols = [_col_name(c) for c in _partition_cols(args)]
            sites.append({
                "line": line.strip()[:300],
                "partition": pcols,
                "has_upstream_agg": has_agg,
                "has_group_limit": has_group_limit,
                "is_primitive_local": any(
                    c.startswith("__pid") for c in pcols
                ),
                "is_offset_table": "__ptot" in line or "__pcnt" in line,
            })
    return sites


def join_smells(key: str, plan: str) -> list[dict]:
    """Quadratic join shapes: a CartesianProduct node is an
    all-pairs shuffle-side cross join — never acceptable at corpus
    grain (broadcast nested-loop against a model-sized frame is the
    legitimate tiny-cross-join shape and is NOT flagged)."""
    return [
        {"key": key, "line": ln.strip()[:200]}
        for ln in plan.splitlines()
        if "CartesianProduct" in ln
    ]


def violations(key: str, plan: str) -> list[dict]:
    out = []
    for s in scan_plan(plan):
        if s["is_primitive_local"] or s["is_offset_table"]:
            continue
        if s["has_upstream_agg"] or s["has_group_limit"]:
            continue
        pcols = s["partition"]
        head = pcols[0] if pcols else ""
        funnel = (not pcols) or all(c in LOW_CARD_COLS for c in pcols)
        if not funnel:
            continue
        if (key, head) in WHITELIST:
            continue
        out.append({"key": key, "partition": pcols, "line": s["line"]})
    return out


def _formatted_sections(md_text: str) -> dict[str, str]:
    """PLANS.md -> {key: fenced formatted-plan text}."""
    out: dict[str, str] = {}
    key = None
    in_fence = False
    buf: list[str] = []
    for line in md_text.splitlines():
        if line.startswith("## "):
            key = line[3:].strip()
            continue
        if line.startswith("```"):
            if in_fence and key is not None:
                out[key] = "\n".join(buf)
                buf = []
            in_fence = not in_fence
            continue
        if in_fence:
            buf.append(line)
    return out


def scan_formatted(plan: str) -> list[dict]:
    """windowspecdefinition sites of a FORMATTED explain (the PLANS.md
    pinned texts): node tree + numbered detail blocks instead of the
    inline toString style scan_plan handles. The subtree-agg check
    walks the final-plan tree; partition heads come from the node's
    detail block."""
    lines = plan.splitlines()
    # tree = lines before the first column-0 "(1) Node" detail block
    tree_end = len(lines)
    for i, line in enumerate(lines):
        if re.match(r"\(\d+\) \S", line):
            tree_end = i
            break
    tree = lines[:tree_end]
    # prefer the AQE final plan subtree; ignore the initial-plan twin
    lo, hi = 0, len(tree)
    for i, line in enumerate(tree):
        if "== Final Plan ==" in line:
            lo = i + 1
        elif "== Initial Plan ==" in line:
            hi = i
            break
    tree = tree[lo:hi]
    # detail blocks keyed by node id
    details: dict[str, list[str]] = {}
    cur = None
    for line in lines[tree_end:]:
        m = re.match(r"\((\d+)\) ", line)
        if m:
            cur = m.group(1)
            details[cur] = [line]
        elif cur is not None:
            details[cur].append(line)
    def subtree_scan(i: int, seen: frozenset) -> tuple[bool, bool]:
        """(has_agg, has_group_limit) for the input subtree of tree
        line i. A ReusedExchange is a printed leaf whose real subtree
        (the original Exchange) sits in another branch — resolve it via
        the detail block's ``Reuses operator id`` and keep scanning
        there, else a post-AQE final plan under-credits every window
        fed through exchange reuse."""
        indent = _node_indent(tree[i])
        for j in range(i + 1, len(tree)):
            nxt = tree[j]
            d = _node_indent(nxt)
            if d <= indent:
                break
            if "WindowGroupLimit" in nxt:
                return False, True
            if any(a in nxt for a in _AGG_NODES):
                return True, False
            rm = re.search(r"ReusedExchange \((\d+)\)", nxt)
            if rm and rm.group(1) not in seen:
                block = "\n".join(details.get(rm.group(1), []))
                om = re.search(r"Reuses operator id: (\d+)", block)
                if om:
                    oid = om.group(1)
                    for k, oline in enumerate(tree):
                        if re.search(rf"\b\w+ \({oid}\)", oline):
                            agg, gl = subtree_scan(
                                k, seen | {rm.group(1)}
                            )
                            if agg or gl:
                                return agg, gl
                            break
        return False, False

    sites = []
    for i, line in enumerate(tree):
        m = re.search(r"\bWindow(?:InPandas)? \((\d+)\)", line)
        if m is None:
            continue
        has_agg, has_group_limit = subtree_scan(i, frozenset())
        block_lines = details.get(m.group(1), [])
        block = "\n".join(block_lines)
        for bl in block_lines:
            for wm in re.finditer(r"windowspecdefinition\(", bl):
                args = _spec_args(bl, wm.start())
                pcols = [_col_name(c) for c in _partition_cols(args)]
                sites.append({
                    "line": bl.strip()[:300],
                    "partition": pcols,
                    "has_upstream_agg": has_agg,
                    "has_group_limit": has_group_limit,
                    "is_primitive_local": any(
                        c.startswith("__pid") for c in pcols
                    ),
                    "is_offset_table": "__ptot" in block
                    or "__pcnt" in block,
                })
    return sites


def violations_formatted(key: str, plan: str) -> list[dict]:
    out = []
    for s in scan_formatted(plan):
        if s["is_primitive_local"] or s["is_offset_table"]:
            continue
        if s["has_upstream_agg"] or s["has_group_limit"]:
            continue
        pcols = s["partition"]
        head = pcols[0] if pcols else ""
        funnel = (not pcols) or all(c in LOW_CARD_COLS for c in pcols)
        if not funnel:
            continue
        if (key, head) in WHITELIST:
            continue
        out.append({"key": key, "partition": pcols, "line": s["line"]})
    return out


def main_plans(path: str, keys: list[str]) -> int:
    import json

    with open(path) as fh:
        sections = _formatted_sections(fh.read())
    use = keys or sorted(sections)
    flagged, cartesians = [], []
    for k in use:
        plan = sections.get(k)
        if plan is None:
            continue
        flagged.extend(violations_formatted(k, plan))
        cartesians.extend(join_smells(k, plan))
    print(json.dumps({
        "n_keys": len(use),
        "n_flagged_sites": len(flagged),
        "flagged_keys": sorted({f["key"] for f in flagged}),
        "cartesian_keys": sorted({c["key"] for c in cartesians}),
        "flagged": flagged[:50],
    }, indent=1))
    return 1 if flagged or cartesians else 0


def main(argv: list[str]) -> int:
    import json
    import os
    import sys

    if argv and argv[0] == "--plans":
        return main_plans(argv[1], argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from icecube_spark.session import get_spark

    sf_dir = os.environ.get("ICECUBE_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("funnel-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    keys = argv or sorted(qs)
    flagged, errs = [], {}
    for i, k in enumerate(keys):
        try:
            plan = (
                qs[k](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString()
            )
            v = violations(k, plan)
            flagged.extend(v)
            if v:
                print(json.dumps(v), flush=True)
        except Exception as exc:  # keep sweeping
            errs[k] = f"{type(exc).__name__}: {exc}"[:200]
        if i % 25 == 24:
            print(f"# {i + 1}/{len(keys)} scanned, "
                  f"{len(flagged)} flagged", flush=True)
    print(json.dumps({
        "n_keys": len(keys),
        "n_flagged_sites": len(flagged),
        "flagged_keys": sorted({f['key'] for f in flagged}),
        "errors": errs,
    }, indent=1))
    return 1 if flagged else 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
