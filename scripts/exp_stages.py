#!/usr/bin/env python
"""Stage-level breakdown of the extraction job at one parallelism level.

Writes a Spark event log, then reports per-stage wall time, task-time sum,
and the gaps between stages (driver/AQE/barrier time) — to locate the
non-scaling component of the local[32] run.

Usage: python scripts/exp_stages.py CPUS
"""
import glob, json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main():
    cpus = int(sys.argv[1])
    evdir = f"/tmp/evlog_{cpus}"
    os.makedirs(evdir, exist_ok=True)
    import shutil as _sh; _sh.rmtree(evdir, ignore_errors=True); os.makedirs(evdir, exist_ok=True)
    from pyspark.sql import SparkSession
    from ocr_spark.pipeline import extract_transcripts
    spark = (SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2*cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                "20000" if cpus >= 32 else "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # mirror the bench worker's scan-split sizing (2 task waves at 2*cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "16384")
    parquet = os.path.join(REPO, ".bench", "transcripts_60000.parquet")
    df = spark.read.parquet(parquet)
    def _force(d): d.write.format("noop").mode("overwrite").save()
    # salt=0: limit() collapses to one partition and auto-salt would warm
    # the Exchange-bearing repartition plan instead (same fix as bench.worker)
    _force(extract_transcripts(df.limit(3000), salt=0, partitions=2*cpus,
                               reassemble="sorted"))
    t0 = time.time()
    # round 4: the benched at-scale shape (zero exchanges); pass
    # "--legacy" to measure the old salt=8 + window form instead
    if "--legacy" in sys.argv:
        _force(extract_transcripts(df, salt=8, partitions=2*cpus))
    else:
        _force(extract_transcripts(df, salt="auto", partitions=2*cpus,
                                   reassemble="sorted"))
    wall = time.time() - t0
    spark.stop()
    time.sleep(1)

    stages = {}
    tmin = None
    paths = [p for p in glob.glob(evdir + "/**", recursive=True) if os.path.isfile(p) and "appstatus" not in p]
    for path in paths:
        for line in open(path, errors="ignore"):
            try: ev = json.loads(line)
            except Exception: continue
            e = ev.get("Event")
            if e == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {"name": si["Stage Name"][:40],
                    "ntasks": si["Number of Tasks"], "sub": si.get("Submission Time")}
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                s = stages.setdefault(si["Stage ID"], {})
                s.update(name=si["Stage Name"][:40], ntasks=si["Number of Tasks"],
                         sub=si.get("Submission Time"), done=si.get("Completion Time"))
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                m = ev.get("Task Metrics") or {}
                s = stages.setdefault(sid, {})
                s["task_ms"] = s.get("task_ms", 0) + (ti.get("Finish Time",0)-ti.get("Launch Time",0))
                s["cpu_ms"] = s.get("cpu_ms", 0) + m.get("Executor CPU Time",0)/1e6
                s["deser_ms"] = s.get("deser_ms",0) + m.get("Executor Deserialize Time",0)
                s["gc_ms"] = s.get("gc_ms",0) + m.get("JVM GC Time",0)
                s["shw_ms"] = s.get("shw_ms",0) + (m.get("Shuffle Write Metrics",{}) or {}).get("Shuffle Write Time",0)/1e6
                s["shr_ms"] = s.get("shr_ms",0) + (m.get("Shuffle Read Metrics",{}) or {}).get("Fetch Wait Time",0)
                s["shw_b"] = s.get("shw_b",0) + (m.get("Shuffle Write Metrics",{}) or {}).get("Shuffle Bytes Written",0)
                s["shr_b"] = s.get("shr_b",0) + (m.get("Shuffle Read Metrics",{}) or {}).get("Local Bytes Read",0) + (m.get("Shuffle Read Metrics",{}) or {}).get("Remote Bytes Read",0)
    done = [(sid, s) for sid, s in stages.items() if s.get("sub") and s.get("done")]
    done.sort(key=lambda x: x[1]["sub"])
    # keep only the main job's stages (the last ~2/3 of wall time); print all
    print(f"wall={wall:.2f}s  cpus={cpus}")
    t_first = done[0][1]["sub"]
    prev_end = None
    for sid, s in done:
        gap = (s["sub"] - prev_end)/1000 if prev_end else 0
        prev_end = max(prev_end or 0, s["done"])
        print(f"stage {sid:3d} {s.get('name','')[:36]:36s} ntasks={s.get('ntasks',0):3d} "
              f"start=+{(s['sub']-t_first)/1000:6.2f} dur={(s['done']-s['sub'])/1000:6.2f}s gap={gap:5.2f}s "
              f"tasksum={s.get('task_ms',0)/1000:7.1f}s cpu={s.get('cpu_ms',0)/1000:7.1f}s gc={s.get('gc_ms',0)/1000:5.1f}s "
              f"shW={s.get('shw_b',0)/1e6:6.1f}MB shR={s.get('shr_b',0)/1e6:6.1f}MB")
if __name__ == "__main__":
    main()
