#!/usr/bin/env bash
# Per-query oracle compare with a time budget — the sf1-class cycle
# driver. One unscalable ORACLE (DuckDB-side recursive CTE) must not
# sink the whole cycle: each query runs in its own diffcheck process
# under `timeout`, and budget overruns are recorded as documented
# oracle-capacity exclusions (the ENGINE dump exists either way; the
# exclusion is about the oracle's cost, not the engine's).
#
# Usage: verifycycle.sh <sfDir> <verifyOutDir> <resultsDir> [budget_sec=300]
set -u
SF="$1"; OUT="$2"; RES="$3"; BUDGET="${4:-300}"
mkdir -p "$RES"
for q in $(python3 -c "import json;print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  if [ -f "$RES/$q.rc" ]; then continue; fi  # resumable
  if [ ! -d "$OUT/$q" ]; then continue; fi   # subset dump: only compare what Verify wrote
  timeout "$BUDGET" python3 tools/diffcheck.py "$SF" "$OUT" "$q" \
    > "$RES/$q.log" 2>&1
  echo $? > "$RES/$q.rc"
  echo "$q rc=$(cat "$RES/$q.rc")"
done
python3 - "$RES" <<'EOF'
import json, os, sys
res = sys.argv[1]
rec = {"failed": [], "oracle_timeout": [], "n_compared": 0, "n_failed": 0,
       "n_hash_exact": 0, "queries": {}}
for f in sorted(os.listdir(res)):
    if not f.endswith(".rc"):
        continue
    q = f[:-3]
    rc = int(open(os.path.join(res, f)).read().strip())
    log = open(os.path.join(res, q + ".log")).read()
    rows = None
    for line in log.splitlines():
        if line.startswith(q + ": OK ("):
            rows = int(line.split("(")[1].split()[0])
    if rc == 124:
        rec["oracle_timeout"].append(q)
    else:
        rec["n_compared"] += 1
        if rc == 0 and rows is not None:
            rec["n_hash_exact"] += 1
            rec["queries"][q] = rows
        else:
            rec["n_failed"] += 1
            rec["failed"].append(q)
with open(os.path.join(res, "record.json"), "w") as fh:
    json.dump(rec, fh, indent=1, sort_keys=True)
print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                  for k, v in rec.items() if k != "queries"}))
EOF
