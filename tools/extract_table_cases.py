#!/usr/bin/env python3
"""Extract full testcases over the known fixture tables (test_array,
test_unnest) from the reference quidem corpora, with expected result
grids. Output: JSON lines {file, tid, query, cols, rows}.
"""
import re, sys, glob, os, json

ROOTS = ["/root/reference/quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest"]
CASE = re.compile(
    r"# TESTCASE: \S+ TEST_ID: (\S+)\s*\n#-+\n"
    r"((?:SELECT|WITH|\().*?;)\n(.*?)\n!(ok|error)", re.S)
ROW = re.compile(r"^\|(.*)\|$", re.M)

def main():
    want_tables = {"test_array", "test_unnest"}
    n = 0
    for root in ROOTS:
        for f in sorted(glob.glob(root + "/**/*.iq", recursive=True)):
            base = os.path.basename(f)
            try:
                text = open(f, encoding="utf-8").read()
            except Exception:
                continue
            for m in CASE.finditer(text):
                tid, q, res, kind = m.groups()
                if kind != "ok":
                    continue
                tables = set(re.findall(r"\bFROM\s+([a-zA-Z_][a-zA-Z0-9_]*)", q, re.I))
                # only fixture tables (plus derived-table FROM ( which regex skips)
                named = {t for t in tables if not t.startswith("t1") and t != "t"}
                if not named <= want_tables or not (named & want_tables):
                    continue
                lines = ROW.findall(res)
                if not lines:
                    # 0-row results: header-only tables have no | rows in
                    # mysql format? they do (header). skip if none at all
                    if "(0 rows)" in res:
                        cols, rows = None, []
                    else:
                        continue
                else:
                    # cells may CONTAIN '|' (array_to_string with a pipe
                    # separator), so split on the padded ' | ' delimiter
                    # into exactly ncols cells
                    cols = [c.strip() for c in lines[0].split(" | ")]
                    ncols = len(cols)
                    def cells(ln):
                        if ncols == 1:
                            return [ln.strip()]
                        return [c.strip() for c in ln.split(" | ", ncols - 1)]
                    rows = [cells(ln) for ln in lines[1:]]
                print(json.dumps({"file": base, "tid": tid,
                                  "query": " ".join(q.rstrip(";").split()),
                                  "cols": cols, "rows": rows}))
                n += 1
    print(f"# extracted {n}", file=sys.stderr)

if __name__ == "__main__":
    main()
