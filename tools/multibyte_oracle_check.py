#!/usr/bin/env python3
"""Cross-engine proof that the Karp-Rabin hash oracles fold UTF-8 OCTETS
bit-for-bit (round-9 item): build a documents fixture full of non-ASCII
text (2-, 3- and 4-byte encodings, planted near-dup pairs), run the
engine's fingerprint/simhash queries over it via graft.Verify, then run
their DuckDB oracles on the same parquet and compare — exactly the
driver's gate, on a corpus the ASCII-era oracles could not survive.

Whitespace stays plain spaces (the one remaining envelope constraint:
Java \\s includes \\x0B, RE2's does not) and non-ASCII letters are
already lowercase (lower() simple-case mapping differences are a
tokenization concern, orthogonal to the fold under test).

Usage: python3 tools/multibyte_oracle_check.py   (run from repo root)
"""
import subprocess, sys, tempfile, os
import pandas as pd

QUERIES = "q_dedup_simhash,q_dedup_fingerprint,q_text_fingerprint"

base = [
    "el niño café corrió por la señal número {} hacia la montaña überall",
    "日本語 の 形態素 解析 は 難しい です ね 番号 {} を 確認 して",
    "смесь русских слов и чисел {} для проверки юникода в движке",
    "emoji 🎉 mixé payload 🚀 number {} with astral-plane χαρακτήρες",
    "ütf-8 ðata with mixed 中文 and ελληνικά tokens round {} done",
]

def build_fixture(path):
    rows = []
    did = 0
    for i in range(10):
        for t in base:
            text = t.format(i)
            rows.append((did, text))
            did += 1
            if i % 3 == 0:  # planted near-dup: one token edited
                rows.append((did, text + " extra"))
                did += 1
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df.to_parquet(os.path.join(path, "documents.parquet"))
    return len(rows)

def main():
    fixture = tempfile.mkdtemp(prefix="graft-mb-fixture-")
    out = tempfile.mkdtemp(prefix="graft-mb-verify-")
    n = build_fixture(fixture)
    print(f"fixture: {n} multibyte docs at {fixture}")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {fixture} {out} {QUERIES}"],
        capture_output=True, text=True)
    failures = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l]
    if r.returncode != 0 or failures:
        print("\n".join(failures) or r.stdout[-2000:])
        sys.exit(1)
    check = subprocess.run(
        [sys.executable, "tools/oracle_check.py", fixture, out])
    sys.exit(check.returncode)

if __name__ == "__main__":
    main()
