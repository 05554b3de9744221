"""Build the extreme-value oracle-audit corpus: a copy of a gate SF dir
whose ``events`` table carries the finite-but-insane rows the round-11
extreme-boundary probe mapped (SCALE.md, "Extreme-magnitude /
extreme-time probe") — the rows where the BASE value-family oracles
error by construction and the sanity-bound variants
(plans/sanity.py, functions/sanity.py) must quarantine:

- value = 1e300: an overflowed upstream parse one step short of inf —
  finite, so the round-10 non-finite contract passes it through, but it
  overflows DuckDB's STDDEV_SAMP (x**2 leaves double range) and every
  DECIMAL hash-stability cast while Spark silently keeps computing;
- value = 1e30: small enough for every double aggregate, still far past
  the DECIMAL(18,6) domain — isolates the cast boundary from the
  second-moment boundary;
- value = -1e15: past the |x| >= ~1e10 regime where a double's ulp
  exceeds 6-dp resolution, so cross-engine 6-dp agreement on
  independently-ordered sums stops being meaningful (the probe's
  q_order_deltas red row class);
- value = 5e-324 (denormal): EXTREME BUT SANE — must be kept, proving
  the bound quarantines by magnitude, not by weirdness (its effect on
  every 6-dp moment is exactly absorbed, so determinism holds);
- value = NaN: the round-10 non-finite class — sane_measurement must
  quarantine it too (the sanity bound is a strict subset of
  finite_or_null);
- ts = 1950-01-01 (pre-epoch clock garbage) and ts = 9999-12-31 (the
  watermark poison: one such event evicts a stream's entire tail —
  test_far_future_event_poisons_watermark_and_evicts_stream_tail):
  both must leave windowing entirely, down the NULL-ts track.

The other nine tables copy through unchanged — this corpus is scoped to
the events-value/event-time sanity contract; the broader probe recipe
(1e30 embedding components, 1e15 money sums, 50 k-char documents)
stays documented in SCALE.md with its per-class deploy guidance.

    python tools/make_extreme_corpus.py              # sf0.001 -> /tmp/sfextreme
    tests/test_extreme_corpus_audit.py               # the pytest twin

Expected on this corpus: q_value_stats_sane / q_value_by_window_sane
match their oracles exactly (and their quarantine ledgers are nonzero);
the BASE q_value_stats / q_value_by_window ORACLES raise in DuckDB
(STDDEV overflow / DECIMAL cast out-of-range) — which is the audit's
proof that the sanity variants are load-bearing, not decorative.
"""

from __future__ import annotations

import os
import shutil
import sys

COPY_THROUGH = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()

# (event_id, ts SQL literal, user_id, event_type, value SQL literal, quarantined-by)
EXTREME_EVENT_ROWS = (
    (9100001, "(SELECT min(ts) FROM src)", 81, "view", "1e300", "magnitude"),
    (9100002, "(SELECT min(ts) FROM src)", 82, "view", "1e30", "magnitude"),
    (9100003, "(SELECT min(ts) FROM src)", 83, "view", "-1e15", "magnitude"),
    (9100004, "(SELECT min(ts) FROM src)", 84, "view", "5e-324", None),
    (9100005, "(SELECT min(ts) FROM src)", 85, "view", "'NaN'::DOUBLE", "non-finite"),
    (9100006, "TIMESTAMP '1950-01-01 00:00:00'", 86, "click", "1.0", "event-time"),
    (9100007, "TIMESTAMP '9999-12-31 00:00:00'", 87, "click", "2.0", "event-time"),
)


def build(src: str, dst: str) -> None:
    import duckdb

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS FROM '{src}/events.parquet'")
    extra = "\n  ".join(
        f"UNION ALL SELECT {eid}, {ts}, {uid}, '{etype}', {val}, '{{}}'"
        for eid, ts, uid, etype, val, _why in EXTREME_EVENT_ROWS
    )
    con.execute(f"""
COPY (
  SELECT * FROM src
  {extra}
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")
    for t in COPY_THROUGH:
        shutil.copy(os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet"))
    n, n_ts = con.execute(
        f"SELECT count(*), count(ts) FROM '{dst}/events.parquet'"
    ).fetchone()
    con.close()
    quarantined = sum(1 for r in EXTREME_EVENT_ROWS if r[5])
    print(
        f"{dst}: events {n} rows (+{len(EXTREME_EVENT_ROWS)} extreme, "
        f"{quarantined} quarantine-bound, {n_ts} dated incl. pre-1970/year-9999)"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfextreme"
    build(src, dst)
