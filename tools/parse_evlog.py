#!/usr/bin/env python3
"""Attribute a Spark event log (zstd, written when SPARK_GRAFT_EVENTLOG_DIR
is set on GraftSession) to per-stage wall/CPU/GC/shuffle/spill, grouped by
the bench's per-query job descriptions (Bench.timeOnce sets
"bench:<query>"). Usage:

  python3 tools/parse_evlog.py ['<glob of events files>'] [min stage seconds]

Defaults: '/tmp/evlog/*/events*', 0.08 s. Prints every stage above the
threshold plus total stage-wall per job description — the profiling
instrument behind the r13 optimization round's stage attributions.
"""
import json, glob, collections, subprocess, sys

pat = sys.argv[1] if len(sys.argv) > 1 else '/tmp/evlog/*/events*'
mind = float(sys.argv[2]) if len(sys.argv) > 2 else 0.08
matches = sorted(glob.glob(pat))
if not matches:  # ADVICE r13: clear message instead of an opaque IndexError
    sys.exit(f"parse_evlog: no event logs match {pat!r} — "
             "run with SPARK_GRAFT_EVENTLOG_DIR set, and quote the glob")
f = matches[-1]
print('log:', f)
if f.endswith('.zstd'):
    txt = subprocess.run(['unzstd', '-c', f], capture_output=True).stdout.decode()
else:  # uncompressed event log (spark.eventLog.compress off)
    txt = open(f, encoding='utf-8', errors='replace').read()
stages, props, accum = {}, {}, {}
for line in txt.splitlines():
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get('Event')
    if ev == 'SparkListenerJobStart':
        desc = (e.get('Properties') or {}).get('spark.job.description', '')
        for sid in e.get('Stage IDs', []):
            props[sid] = desc
    elif ev == 'SparkListenerTaskEnd':
        tm = e.get('Task Metrics') or {}
        a = accum.setdefault(e['Stage ID'], collections.Counter())
        a['cpu'] += tm.get('Executor CPU Time', 0) / 1e9
        a['run'] += tm.get('Executor Run Time', 0) / 1e3
        a['gc'] += tm.get('JVM GC Time', 0) / 1e3
        srm = tm.get('Shuffle Read Metrics') or {}
        a['sr'] += srm.get('Remote Bytes Read', 0) + srm.get('Local Bytes Read', 0)
        swm = tm.get('Shuffle Write Metrics') or {}
        a['sw'] += swm.get('Shuffle Bytes Written', 0)
        a['spill'] += tm.get('Disk Bytes Spilled', 0)
    elif ev == 'SparkListenerStageCompleted':
        si = e['Stage Info']
        dur = (si.get('Completion Time', 0) - si.get('Submission Time', 0)) / 1e3
        stages[si['Stage ID']] = (dur, si['Stage Name'],
                                  si['Number of Tasks'],
                                  props.get(si['Stage ID'], ''))
tot = collections.Counter()
for sid, (dur, name, nt, desc) in sorted(stages.items()):
    tot[desc] += dur
    if dur > mind:
        a = accum.get(sid, {})
        print(f"stage {sid:4d} {dur:6.2f}s tasks={nt:4d} cpu={a.get('cpu',0):6.1f} "
              f"run={a.get('run',0):6.1f} gc={a.get('gc',0):5.1f} "
              f"srMB={a.get('sr',0)/1e6:7.1f} swMB={a.get('sw',0)/1e6:7.1f} "
              f"spillMB={a.get('spill',0)/1e6:6.1f} [{desc[:24]}] {name[:70]}")
print()
for d, s in tot.most_common(10):
    print(f"{s:7.2f}s  {d[:60]}")
