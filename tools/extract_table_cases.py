#!/usr/bin/env python3
"""Extract full testcases over the known fixture tables (test_array,
test_unnest, test_win, test_agg_funcs, test_json_cols) from the reference
quidem corpora, with expected result grids. Output: JSON lines
{file, tid, query, cols, rows, dataset}.

qaJsonCols is restricted to the funcs_and_sql dataset — the ingest/*
variants re-ingest the documents under different specs (rollup, flatten,
tsv) and have per-variant schemas, so their grids don't replay against one
fixture. Fixture data for test_win / test_json_cols comes from
extract_fixture_data.py.
"""
import re, sys, glob, os, json

ROOTS = ["/root/reference/quidem-ut/src/test/quidem/org.apache.druid.quidem.QTest"]
CASE = re.compile(
    r"# TESTCASE: \S+ TEST_ID: (\S+)\s*\n#-+\n\s*"
    r"((?:SELECT|WITH|\().*?;)\n(.*?)\n!(ok|error)", re.S)
ROW = re.compile(r"^\|(.*)\|$", re.M)
USE = re.compile(r"^!use \S*datasets=(\S+?)(?:&\S*)?$", re.M)
# FROM/JOIN table references; `(?!\s*\()` skips function-call FROMs
# (POSITION(x FROM string_agg(...))) and derived tables
TABLE = re.compile(r"\b(?:FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)\b(?!\s*\()", re.I)

def main():
    want_tables = {"test_array", "test_unnest", "test_win",
                   "test_agg_funcs", "test_json_cols",
                   # qaTpch (pipe-delimited .tbl.gz, AuditSweep registers)
                   "customer", "lineitem", "nation", "orders", "part",
                   "partsupp", "region", "supplier",
                   # qaSsb norm + denorm
                   "ssb_denorm", "ssb_norm_customer", "ssb_norm_date",
                   "ssb_norm_lineorder", "ssb_norm_part",
                   "ssb_norm_supplier"}
    n = 0
    for root in ROOTS:
        for f in sorted(glob.glob(root + "/**/*.iq", recursive=True)):
            base = os.path.basename(f)
            try:
                text = open(f, encoding="utf-8").read()
            except Exception:
                continue
            use = USE.search(text)
            dataset = use.group(1).rsplit("/", 1)[-1] if use else ""
            # qaJsonCols ingest/* datasets share the table NAME with
            # per-variant content — AuditSweep phases them by dataset;
            # tag them so the json-cols variants don't collide
            if "test_json_cols" in text and dataset != "funcs_and_sql":
                dataset = "jsoncols_" + dataset
            for m in CASE.finditer(text):
                tid, q, res, kind = m.groups()
                if kind != "ok":
                    continue
                tables = set(t.lower() for t in TABLE.findall(q))
                # drop join aliases / keywords the regex can trip on
                named = {t for t in tables
                         if not t.startswith("t1") and t not in
                         ("t", "t2", "lateral", "unnest")}
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
                                  "cols": cols, "rows": rows,
                                  "dataset": dataset}))
                n += 1
    n += calcite_tree()
    print(f"# extracted {n}", file=sys.stderr)


# The sql/src/test/quidem tree (DecoupledPlanningCalciteJoinQueryTest etc.)
# uses a different format: a `# <testname> case-crc:` header, !set lines, the
# query terminated by `;`, the mysql grid, `!ok`, then plan dumps. Fixtures
# are the standard Calcite test datasets (foo / numfoo / lookup.lookyloo),
# registered by AuditSweep's "calcite" phase.
CQ_CASE = re.compile(
    r"(?ms)^((?:SELECT|WITH|select|with|\()\b.*?;)\s*\n(.*?)\n!ok")
CQ_TABLE = re.compile(
    r"\b(?:FROM|JOIN)\s+([a-zA-Z_\"][a-zA-Z0-9_.\"]*)", re.I)


def calcite_tree():
    roots = glob.glob(
        "/root/reference/sql/src/test/quidem/org.apache.druid.sql.calcite.*"
    ) + glob.glob(
        "/root/reference/sql/src/test/quidem/org.apache.druid.quidem."
        "SqlQuidemTest")
    want = {"foo", "numfoo", "druid.foo", "druid.numfoo", "lookup.lookyloo",
            "broadcast", "druid.broadcast"}
    n = 0
    for root in sorted(roots):
        for f in sorted(glob.glob(root + "/**/*.iq", recursive=True)):
            base = os.path.basename(f)
            try:
                text = open(f, encoding="utf-8").read()
            except Exception:
                continue
            for i, m in enumerate(CQ_CASE.finditer(text)):
                q, res = m.groups()
                tables = {t.strip('"').lower()
                          for t in CQ_TABLE.findall(q)}
                # CTE and derived-table aliases excuse themselves
                ctes = {t.lower() for t in
                        re.findall(r"(?i)\b([a-zA-Z_]\w*)\s+AS\s*\(", q)}
                named = tables - ctes - {"lateral", "unnest", "t", "t1",
                                         "t2", "x", "v"}
                if not (named & want) or not (named <= want):
                    continue
                lines = ROW.findall(res)
                if not lines:
                    if "(0 rows)" not in res:
                        continue
                    cols, rows = None, []
                else:
                    cols = [c.strip() for c in lines[0].split(" | ")]
                    ncols = len(cols)

                    def cells(ln):
                        if ncols == 1:
                            return [ln.strip()]
                        return [c.strip() for c in ln.split(" | ", ncols - 1)]
                    rows = [cells(ln) for ln in lines[1:]]
                qn = " ".join(q.rstrip(";").split())
                # the tree pins `!set sqlCurrentTimestamp
                # 2000-01-01T00:00:00Z` — inline the pinned clock
                qn = re.sub(r"(?i)\bCURRENT_TIMESTAMP\b",
                            "TIMESTAMP '2000-01-01 00:00:00'", qn)
                qn = re.sub(r"(?i)\bCURRENT_DATE\b", "DATE '2000-01-01'", qn)
                print(json.dumps({"file": base, "tid": f"c{i}",
                                  "query": qn,
                                  "cols": cols, "rows": rows,
                                  "dataset": "calcite"}))
                n += 1
    return n

if __name__ == "__main__":
    main()
