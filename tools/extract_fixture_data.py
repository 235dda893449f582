#!/usr/bin/env python3
"""Dump the reference quidem fixture datasets the AuditSweep replay needs
but that are too large to inline in Scala:

  /tmp/test_win.jsonl        — qaWin's test_win (768 rows; scalar dims only,
                               the corpus never touches the nested JSON dims)
  /tmp/test_json_cols.jsonl  — qaJsonCols funcs_and_sql's test_json_cols
                               (4 rows; nested columns re-serialized to
                               compact JSON text, matching the engine's
                               nested-data-as-STRING convention)

Reads the reference tree's public test data (gzipped JSON ingest inputs);
output is consumed by `graft.AuditSweep`.
"""
import gzip, json, sys

REF = "/root/reference/sql/src/test/quidem/qatests"

def dump_test_win():
    # ingest spec: qaWin/ingest.json — timestampSpec column 'timestamp' (iso),
    # scalar string dims + session_length long; 'language' is castToType
    # ARRAY<STRING> (scalar input -> 1-element array)
    keep_str = ["session", "number", "client_ip", "adblock_list",
                "app_version", "path", "loaded_image", "referrer",
                "referrer_host", "server_ip", "screen", "window",
                "timezone", "timezone_offset"]
    n = 0
    with gzip.open(f"{REF}/qaWin/data/windata.json.gz", "rt") as f, \
         open("/tmp/test_win.jsonl", "w") as out:
        for line in f:
            row = json.loads(line)
            o = {"timestamp": row.get("timestamp")}
            for k in keep_str:
                v = row.get(k)
                o[k] = None if v is None else str(v)
            lang = row.get("language")
            o["language"] = None if lang is None else \
                (lang if isinstance(lang, list) else [str(lang)])
            sl = row.get("session_length")
            o["session_length"] = int(sl) if sl is not None else None
            out.write(json.dumps(o, separators=(",", ":")) + "\n")
            n += 1
    print(f"test_win: {n} rows", file=sys.stderr)

def dump_test_json_cols():
    # funcs_and_sql/ingest.json carries the 4 rows INLINE; the data/ gzip is
    # the same document set. Complex dims -> compact JSON text (engine
    # convention: nested data rides as STRING), scalar 'auto' dims -> typed
    # (s_bool is a LONG 1/0 — Druid strict booleans).
    spec = json.load(open(f"{REF}/qaJsonCols/funcs_and_sql/ingest.json"))
    data = spec["spec"]["ioConfig"]["inputSource"]["data"]
    complex_cols = ["c_empty_obj", "c_empty_array", "c_empty_obj_nested",
                    "c_empty_array_nested", "c1", "c2"]
    n = 0
    with open("/tmp/test_json_cols.jsonl", "w") as out:
        for line in data.strip().split("\n"):
            row = json.loads(line)
            o = {"timestamp": row.get("timestamp"),
                 "s_str": row.get("s_str"),
                 "s_num_int": row.get("s_num_int"),
                 "s_num_float": row.get("s_num_float"),
                 "s_bool": (None if row.get("s_bool") is None
                            else (1 if row["s_bool"] else 0)),
                 "s_null": row.get("s_null")}
            for k in complex_cols:
                v = row.get(k)
                o[k] = None if v is None else json.dumps(v, separators=(",", ":"))
            out.write(json.dumps(o, separators=(",", ":")) + "\n")
            n += 1
    print(f"test_json_cols: {n} rows", file=sys.stderr)

if __name__ == "__main__":
    dump_test_win()
    dump_test_json_cols()
