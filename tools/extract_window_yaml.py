#!/usr/bin/env python3
"""Extract the reference's yaml window corpus
(sql/src/test/resources/calcite/tests/window/*.sqlTest, run by
CalciteWindowQueryTest.java) into the AuditSweep case format.

Each file is a small yaml doc: `sql: |` block + `expectedResults:` list of
row arrays. Cells render like extract_java_cases (ints verbatim, floats
with a trailing .0 for integral values, null -> "", booleans true/false);
the fixtures are the sweep's calcite registrations (foo + wikipedia).
"""
import json
import os
import re
import sys

SRC = "/root/reference/sql/src/test/resources/calcite/tests/window"


def fmt_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return "%d.0" % int(v)
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join("null" if e is None else fmt_cell(e)
                               for e in v) + "]"
    return str(v)


def parse_file(path):
    """Tiny yaml-subset parser: top-level `sql:` literal block and
    `expectedResults:` rows (`- [ a, b, c ]`). Rows are JSON-compatible
    after quoting bare words, which these files don't use (strings are
    always quoted)."""
    sql_lines, rows = [], []
    mode = None
    for line in open(path, encoding="utf-8"):
        if re.match(r"^sql:\s*\|", line):
            mode = "sql"
            continue
        if re.match(r"^expectedResults:", line):
            mode = "rows"
            continue
        if re.match(r"^[A-Za-z_]+:", line):  # other top-level key
            mode = None
            continue
        if mode == "sql":
            if line.strip() == "" and sql_lines and sql_lines[-1] == "":
                continue
            if line.startswith("  ") or line.strip() == "":
                sql_lines.append(line[2:].rstrip("\n"))
            else:
                mode = None
        elif mode == "rows":
            m = re.match(r"^\s*-\s*(\[.*\])\s*$", line)
            if m:
                txt = m.group(1)
                # yaml floats/ints/strings/null are JSON after null stays
                txt = re.sub(r"\bnull\b", "null", txt)
                try:
                    rows.append(json.loads(txt))
                except ValueError:
                    return None  # row the subset can't read -> skip file
    sql = "\n".join(sql_lines).strip()
    if not sql or not rows:
        return None
    return sql, rows


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/window_yaml_cases.jsonl"
    cases, skipped = [], []
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".sqlTest"):
            continue
        parsed = parse_file(os.path.join(SRC, fname))
        if parsed is None:
            skipped.append(fname)
            continue
        sql, rows = parsed
        cases.append({
            "file": fname, "tid": fname.replace(".sqlTest", ""),
            "query": sql,
            "cols": ["c%d" % i for i in range(len(rows[0]))],
            "rows": [[fmt_cell(c) for c in r] for r in rows],
            "dataset": "calcite",
        })
    with open(out_path, "w") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print("emitted %d cases -> %s (skipped: %s)"
          % (len(cases), out_path, skipped), file=sys.stderr)


if __name__ == "__main__":
    main()
