#!/usr/bin/env python3
"""Generate the SQLite bootstrap-loader test fixture (committed binary).

Creates src/test/resources/seatalk/main_1756000000.sqlite with a
chat_message table shaped like the reference's store (columns
sid/_mid/c/t/_createAt/u — connection.py:151, processor.py:428), plus
a small kv blob table, and a JSON-lines sidecar with the exact same
rows so the ScalaTest parity check has engine-independent ground
truth. Deterministic: fixed seed, fixed timestamps, journal_mode
DELETE (no -wal sidecar files).

The row mix deliberately exercises the file format's corner cases the
Scala reader must handle: interior B-tree pages (enough rows for >1
level at page size 4096), NULL columns, negative and 6/8-byte
integers, floats, unicode text, an INTEGER PRIMARY KEY column stored
as NULL-in-record (rowid alias), and payloads long enough to spill
into 1- and multi-page overflow chains.
"""
import json
import os
import random
import sqlite3

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                       "resources", "seatalk")
DB = os.path.join(OUT_DIR, "main_1756000000.sqlite")
SIDECAR = os.path.join(OUT_DIR, "chat_message.jsonl")

random.seed(42)

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa").split()


def content(i):
    if i % 997 == 0:  # ~4.5 KB: one-page overflow at page size 4096
        return json.dumps({"text": " ".join(random.choices(WORDS, k=700))})
    if i % 1499 == 0:  # ~13 KB: multi-page overflow chain
        return json.dumps({"text": " ".join(random.choices(WORDS, k=2000))})
    if i % 211 == 0:  # unicode + group-name shape
        return json.dumps({"gn": f"群聊 {i} — café ☕"}, ensure_ascii=False)
    return json.dumps({"text": " ".join(random.choices(WORDS, k=random.randint(2, 12)))})


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for p in (DB, SIDECAR):
        if os.path.exists(p):
            os.remove(p)
    conn = sqlite3.connect(DB)
    conn.execute("PRAGMA journal_mode=DELETE")
    conn.execute("PRAGMA page_size=4096")
    conn.execute("""
        CREATE TABLE chat_message (
            sid INTEGER, _mid INTEGER PRIMARY KEY, c TEXT, t INTEGER,
            _createAt REAL, u INTEGER)""")
    conn.execute("CREATE TABLE kv (k TEXT, v BLOB)")
    rows = []
    base = 1756000000.0
    for i in range(1, 2001):
        sid = 5_000_000_000 + (i % 37)          # 6-byte integers
        mid = i * 3                              # sparse rowids
        c = content(i)
        t = 12 if i % 211 == 0 else (2 if i % 13 == 0 else 1)
        ts = base + i * 7.25                     # exact in binary float
        u = None if i % 101 == 0 else (-9_000_000_000_000 + i if i % 503 == 0
                                       else 100 + (i % 53))
        rows.append((sid, mid, c, t, ts, u))
    conn.executemany("INSERT INTO chat_message VALUES (?,?,?,?,?,?)", rows)
    conn.executemany("INSERT INTO kv VALUES (?,?)", [
        ("a", b"\x00\x01\x02"), ("b", bytes(range(256))), ("c", b"")])
    conn.commit()
    conn.close()
    with open(SIDECAR, "w") as f:
        for sid, mid, c, t, ts, u in rows:
            f.write(json.dumps({"sid": sid, "_mid": mid, "c": c, "t": t,
                                "_createAt": ts, "u": u}) + "\n")
    print(f"wrote {DB} ({os.path.getsize(DB)} bytes) + sidecar ({len(rows)} rows)")


if __name__ == "__main__":
    main()
