#!/usr/bin/env python3
"""Generate the WAL-sidecar test fixture (committed binaries).

Creates src/test/resources/seatalk/wal_main.sqlite plus its
UNCHECKPOINTED wal_main.sqlite-wal sidecar: rows 1..60 are
checkpointed into the main file; rows 61..100 are committed but live
ONLY in the -wal (the files are copied while the writing connection
is still open, before close would auto-checkpoint). The reader's
documented stance (SqliteSnapshot scaladoc: WAL is NOT implemented,
the snapshot is of a quiesced main file, like the reference copying
only the main DB) is pinned by SqliteSnapshotSpec against this pair:
the main file must read CONSISTENTLY as exactly rows 1..60.
"""
import os
import shutil
import sqlite3

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                       "resources", "seatalk")
WORK = os.path.join(OUT_DIR, "_walwork.sqlite")
MAIN = os.path.join(OUT_DIR, "wal_main.sqlite")


def main():
    for p in (WORK, WORK + "-wal", WORK + "-shm", MAIN, MAIN + "-wal"):
        if os.path.exists(p):
            os.remove(p)
    conn = sqlite3.connect(WORK)
    conn.execute("PRAGMA page_size=4096")
    conn.execute("PRAGMA journal_mode=WAL")
    conn.execute("CREATE TABLE msgs (sid INTEGER, _mid INTEGER PRIMARY KEY,"
                 " c TEXT, t INTEGER, _createAt REAL, u INTEGER)")
    for i in range(1, 61):
        conn.execute("INSERT INTO msgs VALUES (?,?,?,?,?,?)",
                     (i % 7, i, f"checkpointed {i}", i % 3, 1000.0 + i, i))
    conn.commit()
    conn.execute("PRAGMA wal_checkpoint(TRUNCATE)")
    for i in range(61, 101):
        conn.execute("INSERT INTO msgs VALUES (?,?,?,?,?,?)",
                     (i % 7, i, f"wal-only {i}", i % 3, 1000.0 + i, i))
    conn.commit()
    # copy BEFORE close: closing the last connection auto-checkpoints
    shutil.copy(WORK, MAIN)
    shutil.copy(WORK + "-wal", MAIN + "-wal")
    conn.close()
    for p in (WORK, WORK + "-wal", WORK + "-shm"):
        if os.path.exists(p):
            os.remove(p)
    print(f"main: {os.path.getsize(MAIN)} bytes, "
          f"wal: {os.path.getsize(MAIN + '-wal')} bytes")


if __name__ == "__main__":
    main()
