#!/usr/bin/env python3
"""Streaming throughput measurement (VERDICT r6 task 8): file-replay
readStream over the events table with a windowed+watermarked aggregation,
measured end-to-end.

ST1-ST3 duality is hash-asserted at tiny SF (tests/test_streaming_smoke.py);
this adds the missing PERFORMANCE row: events at a real SF are written as N
replay chunks, consumed by the production job shape (maxFilesPerTrigger
micro-batches, 1h tumbling window + 1h watermark, update-mode memory sink),
and the run reports rows/sec plus per-batch latency from the engine's own
StreamingQueryProgress — the numbers a capacity plan starts from.

Metrics:
  * rows_per_sec     — total input rows / wall seconds (end-to-end, includes
                       source listing, state store, sink)
  * batch_ms p50/max — triggerExecution duration per micro-batch: the
                       end-to-end latency an event suffers from file arrival
                       to sink visibility under availableNow replay
  * watermark_lag_s  — (max event-time seen) - (final watermark): should be
                       ~= the declared 1h watermark delay, proving the
                       watermark actually advanced with the replay
Usage: python tools/stream_throughput.py [--sf-dir .data/sf1]
       [--chunks 32] [--files-per-trigger 4] [--out STREAM_THROUGHPUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".data", "sf1"))
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "STREAM_THROUGHPUT.json")
    )
    ap.add_argument(
        "--shape", default="tumbling", choices=("tumbling", "dedup"),
        help="r8 (VERDICT r7 item 7): 'tumbling' = ST1 production shape "
        "(1h window + 1h watermark, update mode — the aggregation-state "
        "path); 'dedup' = ST5 dropDuplicatesWithinWatermark on event_id "
        "(append mode — the dedup-state path, which stresses per-KEY "
        "state instead of per-window state). Results merge per-shape "
        "into --out.",
    )
    args = ap.parse_args()

    from ai_to_cvent_etl_spark.session import get_spark
    from ai_to_cvent_etl_spark.streaming.jobs import (
        dedup_within_watermark,
        read_events_stream,
        replay_dir,
        tumbling_counts,
    )

    spark = get_spark(app_name="stream_throughput", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    src = replay_dir(spark, args.sf_dir, n_chunks=args.chunks)
    try:
        n_rows = spark.read.parquet(src).count()
        max_ts = spark.read.parquet(src).agg({"ts": "max"}).collect()[0][0]

        stream = read_events_stream(
            spark, src, files_per_trigger=args.files_per_trigger
        )
        if args.shape == "dedup":
            # project to the dedup key + event time so the memory sink
            # holds ~16 bytes/row, not the full payload — the measured
            # path is the watermark-bounded dedup STATE, not the sink
            agg = dedup_within_watermark(stream, watermark="1 hour").select(
                "event_id", "ts"
            )
            output_mode = "append"
        else:
            agg = tumbling_counts(stream, watermark="1 hour")
            output_mode = "update"
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName("tput")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        # recentProgress entries expose .json as a str property in PySpark 4
        progress = [
            json.loads(p.json if isinstance(p.json, str) else p.json())
            for p in q.recentProgress
        ]
        batch_ms = sorted(
            p["durationMs"].get("triggerExecution", 0)
            for p in progress
            if p.get("numInputRows", 0) > 0
        )
        wm = [
            p["eventTime"].get("watermark")
            for p in progress
            if p.get("eventTime", {}).get("watermark")
        ]
        final_wm = wm[-1] if wm else None
        lag_s = None
        if final_wm is not None and max_ts is not None:
            import datetime as dt

            # ADVICE r7: the progress JSON may omit fractional seconds, so
            # a fixed '%...%fZ' strptime can crash post-run; and the
            # watermark is UTC while max(ts) comes back naive in the
            # session timezone — normalize both to UTC before differencing
            # or the lag is skewed by the TZ offset.
            wm_ts = dt.datetime.fromisoformat(
                final_wm.replace("Z", "+00:00")
            )
            if max_ts.tzinfo is None:
                # session tz (spark.sql.session.timeZone) is what Spark
                # used to render the naive datetime
                import zoneinfo

                tz_name = spark.conf.get("spark.sql.session.timeZone")
                try:
                    tz = zoneinfo.ZoneInfo(tz_name)
                except (KeyError, ValueError):  # offset-style ids
                    tz = dt.timezone.utc if tz_name in (
                        "UTC", "Z", "+00:00") else None
                if tz is None:
                    max_ts = None  # can't localize honestly -> no lag row
                else:
                    max_ts = max_ts.replace(tzinfo=tz)
        if final_wm is not None and max_ts is not None:
            lag_s = round(
                (
                    max_ts.astimezone(dt.timezone.utc) - wm_ts
                ).total_seconds(),
                1,
            )

        rec = {
            "sf_dir": args.sf_dir,
            "n_rows": n_rows,
            "chunks": args.chunks,
            "files_per_trigger": args.files_per_trigger,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            "n_batches": len(batch_ms),
            "batch_ms_p50": batch_ms[len(batch_ms) // 2] if batch_ms else None,
            "batch_ms_max": batch_ms[-1] if batch_ms else None,
            "final_watermark": final_wm,
            "watermark_lag_s": lag_s,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }
        n_sink = spark.sql("SELECT count(*) FROM tput").collect()[0][0]
        rec["sink_rows"] = n_sink
        if args.shape == "dedup":
            # Honest semantics note: event ids are UNIQUE in the fixture,
            # so any input-vs-sink deficit here is LATE-ROW DROPS, not
            # dedup — the replay chunks are not globally time-ordered, so
            # once the watermark passes a time range, other replicas'
            # rows in that range arrive late and the stateful operator
            # discards them. The measured figure is therefore the
            # watermark + dedup-state filter throughput under
            # out-of-order replay (the production-relevant number); a
            # time-ordered replay would emit ~all rows.
            rec["note"] = (
                "sink deficit = late-row drops under out-of-time-order "
                "replay (event ids unique; see tool source)"
            )
        # r8: one artifact, one record per measured job shape (merge —
        # re-running one shape must not clobber the other). A pre-r8
        # flat-format file is treated as the tumbling record.
        out = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            out = {"tumbling": prev} if "rows_per_sec" in prev else prev
        out[args.shape] = rec
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(json.dumps(rec))
        print(f"sink rows: {n_sink}")
        return 0 if n_sink > 0 else 1
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
