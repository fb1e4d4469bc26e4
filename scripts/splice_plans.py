"""Splice PLANS_partial.md sections (scripts/explain_audit.py with a
key subset) into PLANS.md in place — the per-key resplice used when a
handful of plans change and a full 481-key audit re-run isn't
warranted.

Usage: python scripts/splice_plans.py [partial_path]
"""

from __future__ import annotations

import re
import sys


def split_sections(text: str) -> tuple[str, dict[str, str]]:
    """(preamble, {key: full section text incl. the '## key' line})."""
    parts = re.split(r"(?m)^(## \S+)\n", text)
    pre = parts[0]
    sections = {}
    for head, body in zip(parts[1::2], parts[2::2]):
        sections[head[3:]] = head + "\n" + body
    return pre, sections


def main() -> None:
    partial_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS_partial.md"
    _, new = split_sections(open(partial_path).read())
    pre, cur = split_sections(open("PLANS.md").read())
    missing = [k for k in new if k not in cur]
    if missing:
        raise SystemExit(f"keys not present in PLANS.md: {missing}")
    cur.update(new)
    with open("PLANS.md", "w") as f:
        f.write(pre + "".join(cur.values()))
    print(f"respliced {len(new)} sections: {sorted(new)}")


if __name__ == "__main__":
    main()
