#!/usr/bin/env python3
"""Extract literal-only SELECT testcases from reference .iq files.

A case qualifies when the query is a single `SELECT <expr> <alias>? FROM
<table>;` whose expression references no table columns (checked later by
actually resolving it in Spark against a 1-row relation). Emits TSV:
file<TAB>test_id<TAB>expr<TAB>expected   (expected = first data cell of
the first result row; empty cell -> literal \\N marker).
"""
import re, sys, glob, os

ROOTS = [
    "/root/reference/quidem-ut/src/test/quidem",
    "/root/reference/sql/src/test/quidem",
]

CASE = re.compile(
    r"# TESTCASE: \S+ TEST_ID: (\S+)\s*\n#-+\n"
    r"(SELECT .*?;)\n(.*?)\n!(ok|error)",
    re.S)
ROW = re.compile(r"^\| (.*?) \|$", re.M)

def main():
    out = []
    for root in ROOTS:
        for f in glob.glob(root + "/**/*.iq", recursive=True):
            try:
                text = open(f, encoding="utf-8").read()
            except Exception:
                continue
            for m in CASE.finditer(text):
                tid, q, res, kind = m.groups()
                if kind != "ok":
                    continue
                qq = " ".join(q.split())
                # single-expression SELECT ... FROM t;  (no WHERE/GROUP/JOIN)
                sm = re.match(
                    r"SELECT (.+?)(?: [a-zA-Z_][a-zA-Z0-9_]*)? FROM ([a-zA-Z_\".]+);$",
                    qq)
                if not sm:
                    continue
                if re.search(r"\b(WHERE|GROUP|ORDER|JOIN|UNNEST|OVER|LIMIT|UNION|HAVING)\b",
                             qq, re.I):
                    continue
                expr = re.sub(r"\s+AS$", "", sm.group(1).strip(), flags=re.I)
                cells = ROW.findall(res)
                # header row + at least 1 data row; all data rows identical
                if len(cells) < 2:
                    continue
                data = [c for c in cells[1:]]
                if len(set(data)) != 1:
                    continue
                expected = data[0].strip()
                out.append((os.path.basename(f), tid, expr, expected))
    seen = set()
    for f, tid, expr, exp in out:
        key = expr
        if key in seen:
            continue
        seen.add(key)
        print(f"{f}\t{tid}\t{expr}\t{exp}")

if __name__ == "__main__":
    main()
