#!/usr/bin/env python3
"""Adversarial-corpus harness for the cross-engine oracle gate.

The driver's correctness gate runs over one fixed synthetic corpus; a
dialect divergence that happens not to trigger there (unicode ascii(),
empty split tokens, duplicate texts, degenerate doc lengths) would ship
unnoticed. This script generates randomized + adversarial documents and
embeddings tables (other tables copied from a base SF dir), then runs
the SAME verify_local gate over them.

Usage: python3 scripts/fuzz_corpus_verify.py [--seeds N] [--base sfdir]
"""
import argparse
import os
import random
import shutil
import subprocess
import sys

BASE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(BASE)

# text/dedup/sampling/vector/multimodal families: everything that reads
# only documents/embeddings (cf connector + streaming + relational
# families are exercised by the main gate; re-running them per corpus
# would dominate the runtime without adding dialect coverage)
QUERIES = ",".join(
    [f"d{i:02d}_" for i in range(1, 30)] +
    [f"t{i:02d}_" for i in range(1, 22)] +
    ["p01_", "p02_", "p03_", "p04_", "p05_", "p06_", "p07_", "p08_",
     "p09_", "p10_", "p11_", "p12_", "p13_", "p14_", "p15_", "p16_",
     "p17_", "p18_", "p19_", "p20_", "p21_", "p22_", "p23_", "p24_",
     "p25_", "p26_", "p27_"] +
    [f"v{i:02d}_" for i in range(1, 30)] +
    ["m01_", "m02_", "m03_", "m04_", "m05_", "m06_", "m07_", "m08_",
     "m09_", "m10_"] +
    # events-based batch family: time-series agg, sessionization twin,
    # as-of/range/interval/salted joins, funnel (ties + boundaries are
    # where tie-break discipline would crack)
    ["q17_", "q18_", "q50_", "q51_", "q52_", "q53_", "q55_"] +
    # streaming index maintenance: documents-based, and the empty/
    # whitespace-text docs fuzzed corpora plant are exactly its
    # dl-row-without-postings edge
    ["q66_", "q67_", "q68_", "q70_", "q71_", "q73_", "q74_", "q75_",
     "q76_", "q77_", "q78_"] +
    # relational shared-SQL family over fuzzed lineitem/orders: the
    # integer-cents discipline's ROUND(double) is the divergence
    # surface (Spark rounds the decimal string, DuckDB the binary
    # double — .5-cent-boundary prices are the adversarial case)
    [f"q{i:02d}_" for i in range(1, 17)] +
    ["q28_", "q29_", "q30_", "q31_", "q32_", "q43_"])

WORDS = ("the a of and to in is it for on big data spark row column "
         "merge sort join filter agg window hash key value stream batch "
         "table scan query fast slow small line part order customer "
         "naive uber cafe").split()
UNICODE_WORDS = ["café", "naïve", "über", "日本",
                 "élève", "straße"]


def gen_documents(rng, n, adversarial):
    rows = []
    langs = ["en", "de", "es", "fr", "ja"]
    for i in range(n):
        wl = rng.choice([1, 2, 3, 5, 12, 40, 120]) if adversarial \
            else rng.randint(3, 80)
        words = [rng.choice(WORDS) for _ in range(wl)]
        if adversarial and rng.random() < 0.3:
            words[rng.randrange(len(words))] = rng.choice(UNICODE_WORDS)
        if adversarial and rng.random() < 0.2:
            words.insert(rng.randrange(len(words) + 1), "")  # double space
        if adversarial and rng.random() < 0.15:
            words = [w.upper() if rng.random() < 0.5 else w for w in words]
        text = " ".join(words)
        if adversarial and rng.random() < 0.1:
            text = " " + text  # leading space -> empty first token
        rows.append((i, text, rng.choice(langs), f"src{rng.randrange(7)}",
                     len(text)))
    # plant exact duplicates and a shared-paragraph pair
    if n >= 10:
        rows[3] = (3, rows[1][1], rows[1][2], rows[3][3], len(rows[1][1]))
        shared = " ".join(rng.choice(WORDS) for _ in range(15))
        text5 = shared + " tailA one two"
        rows[5] = (5, text5, "en", "src0", len(text5))
        text7 = shared + " tailB three"
        rows[7] = (7, text7, "en", "src1", len(text7))
    if adversarial and n >= 40:
        # duplicate FLOOD: one text verbatim in 10 docs (collapse paths,
        # hot-bucket caps, line/span dedup all see a real flood)
        flood = "license boilerplate block repeated across many documents"
        for k in range(10):
            rows[20 + k] = (20 + k, flood, "en", f"src{k % 3}", len(flood))
        # whitespace-only and empty texts (split() edge tokens)
        rows[31] = (31, "   ", "en", "src0", 3)
        rows[32] = (32, "", "de", "src1", 0)
        # the same text under two different langs (lang-keyed rollups)
        rows[34] = (34, rows[33][1], "ja", rows[34][3], len(rows[33][1]))
        # huge sparse doc_ids: stress the planted-payload formulas
        # (image/audio/video byte folds), id-hash sampling, and pos
        # encodings far beyond the dense 0..n range
        for k in range(4):
            big = 10_000_000_000_000 + k * 7 + (k % 2)
            text = " ".join(rng.choice(WORDS) for _ in range(9))
            rows.append((big, text, "es", "srcbig", len(text)))
    return rows


def gen_embeddings(rng, n, adversarial):
    rows = []
    for i in range(n):
        if adversarial and i % 17 == 0:
            vec = [0.0] * 64  # zero vector (no direction)
        elif adversarial and i % 11 == 0 and i > 0:
            vec = rows[i - 1][1]  # exact duplicate vector
        elif adversarial and i % 13 == 0 and i > 0:
            # scaled copy: same direction, different magnitude — every
            # cosine TIES with the previous vector's (tie-break surface)
            vec = [round(x * 2, 4) for x in rows[i - 1][1]]
        else:
            vec = [round(rng.uniform(-1, 1), 4) for _ in range(64)]
        if adversarial and i % 23 == 0 and i > 0:
            vec = vec.copy()
            vec[i % 64] = -0.0  # negative zero component
        rows.append((i, vec, rng.randrange(10)))
    if adversarial and n >= 40:
        # embedding flood: ten identical vectors (collapse + cap paths)
        base = [round(rng.uniform(-1, 1), 4) for _ in range(64)]
        for k in range(10):
            rows[25 + k] = (25 + k, base, rows[25 + k][2])
        # vec_ids matching the huge sparse doc_ids (p15/p16 vector stage)
        for k in range(4):
            big = 10_000_000_000_000 + k * 7 + (k % 2)
            rows.append((big, [round(rng.uniform(-1, 1), 4)
                               for _ in range(64)], rng.randrange(10)))
    return rows


def gen_events(rng, n, adversarial):
    """(event_id, ts_micros, user_id, event_type, value, props)."""
    base_us = 1_700_000_000_000_000  # stable epoch base
    rows = []
    types = ["view", "click", "purchase", "scroll"]
    for i in range(n):
        ts = base_us + rng.randrange(0, 7 * 24 * 3600) * 1_000_000 \
            + rng.randrange(0, 1_000_000)
        if adversarial and i % 13 == 0:
            ts = (ts // 3_600_000_000) * 3_600_000_000  # exact hour edge
        uid = rng.randrange(40) if not adversarial else rng.randrange(12)
        val = round(rng.uniform(-100, 100), 3)
        if adversarial and i % 29 == 0:
            val = rng.choice([0.0, -0.0, 1e15, -1e15])
        rows.append((i, ts, uid, rng.choice(types), val, f"p{i % 7}"))
    if adversarial and n >= 30:
        # planted ties: same user, same timestamp, different events
        # (as-of/window tie-break discipline), plus a duplicate event_id
        t0 = rows[10][1]
        rows[11] = (11, t0, rows[10][2], "click", 1.5, "tie")
        rows[12] = (12, t0, rows[10][2], "view", 2.5, "tie")
        rows[13] = (10, t0 + 5, rows[10][2], "purchase", 3.5, "dupid")
    return rows


def gen_orders_lineitem(rng, n_orders, adversarial):
    """FK-consistent orders + lineitem over the copied dimensions
    (custkey 0..149, partkey 0..199, suppkey 0..9)."""
    base_us = 820_454_400_000_000  # 1996-01-01, inside the fixture range
    orders, items = [], []
    for o in range(n_orders):
        od = base_us + rng.randrange(0, 2000) * 86_400_000_000
        price = round(rng.uniform(1, 100000), 2)
        if adversarial and o % 19 == 0:
            price = rng.choice([2.675, 0.615, 10.005, 1.005, 99999.995])
        orders.append((o, rng.randrange(150), rng.choice("POF"), price,
                       od, f"{1 + o % 5}-PRIO"))
        for ln in range(1, 1 + rng.randrange(1, 5)):
            qty = float(rng.randrange(1, 51))
            ep = round(rng.uniform(1, 90000), 2)
            disc = round(rng.uniform(0, 0.1), 2)
            tax = round(rng.uniform(0, 0.08), 2)
            if adversarial and (o + ln) % 17 == 0:
                # .5-cent-boundary products: ep*(1-disc)*100 lands near
                # x.5 — where engine ROUND semantics could split
                ep, disc = 2.675, 0.0
            if adversarial and (o + ln) % 23 == 0:
                ep = 0.005
            ship = od + rng.randrange(-30, 120) * 86_400_000_000
            items.append((o, rng.randrange(200), rng.randrange(10), ln,
                          qty, ep, disc, tax, rng.choice("NAR"),
                          rng.choice("OF"), ship))
    if adversarial and items:
        # duplicate (orderkey, linenumber) — at-least-once ingest shape
        items.append(items[0])
    return orders, items


def build_corpus(seed, base, out, adversarial):
    import duckdb
    rng = random.Random(seed)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    fuzzed = ("documents.parquet", "embeddings.parquet", "events.parquet",
              "orders.parquet", "lineitem.parquet")
    for f in os.listdir(base):
        if f.endswith(".parquet") and f not in fuzzed:
            shutil.copy(os.path.join(base, f), os.path.join(out, f))
    con = duckdb.connect()
    docs = gen_documents(rng, 400, adversarial)
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", docs)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    embs = gen_embeddings(rng, 400, adversarial)
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], "
                "label INT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", embs)
    con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    evs = gen_events(rng, 800, adversarial)
    con.execute("CREATE TABLE ev0 (event_id BIGINT, ts_us BIGINT, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, "
                "props VARCHAR)")
    con.executemany("INSERT INTO ev0 VALUES (?, ?, ?, ?, ?, ?)", evs)
    con.execute(f"""COPY (SELECT event_id, make_timestamp(ts_us) AS ts,
        user_id, event_type, value, props FROM ev0)
        TO '{out}/events.parquet' (FORMAT PARQUET)""")
    orders, items = gen_orders_lineitem(rng, 500, adversarial)
    con.execute("CREATE TABLE o0 (o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
                "od_us BIGINT, o_orderpriority VARCHAR)")
    con.executemany("INSERT INTO o0 VALUES (?, ?, ?, ?, ?, ?)", orders)
    con.execute(f"""COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
        o_totalprice, make_timestamp(od_us) AS o_orderdate,
        o_orderpriority FROM o0)
        TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute("CREATE TABLE l0 (l_orderkey BIGINT, l_partkey BIGINT, "
                "l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, "
                "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
                "l_returnflag VARCHAR, l_linestatus VARCHAR, sd_us BIGINT)")
    con.executemany("INSERT INTO l0 VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                    items)
    con.execute(f"""COPY (SELECT l_orderkey, l_partkey, l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, make_timestamp(sd_us) AS l_shipdate
        FROM l0) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    # dump the CURRENT inventory's names every run (a cached dump would
    # silently exclude queries added after the first fuzzer run)
    names_file = "/tmp/fuzz_query_names.txt"
    if os.path.exists(names_file):
        os.remove(names_file)
    subprocess.run(
        ["sbt", "-batch",
         "runMain graft.Verify --dump-names " + names_file],
        cwd=REPO, capture_output=True, text=True)
    if not os.path.exists(names_file):
        print("could not dump query names; falling back to full run")
    selected = None
    if os.path.exists(names_file):
        all_names = open(names_file).read().split()
        prefixes = QUERIES.split(",")
        selected = [n for n in all_names
                    if any(n.startswith(p) for p in prefixes)]
        print(f"fuzzing {len(selected)} of {len(all_names)} queries")

    failures = 0
    runs = [("adversarial", 42, True)] + [
        (f"seed{s}", s, False) for s in range(args.seeds)]
    for tag, seed, adv in runs:
        out = f"/tmp/fuzz_corpus_{tag}"
        build_corpus(seed, args.base, out, adv)
        env = dict(os.environ)
        if selected:
            env["GRAFT_VERIFY_ONLY"] = ",".join(selected)
        r = subprocess.run(
            [sys.executable, os.path.join(BASE, "verify_local.py"),
             out, f"/tmp/fuzz_out_{tag}"],
            cwd=REPO, env=env, capture_output=True, text=True)
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "?"
        print(f"[{tag}] {tail}")
        if r.returncode != 0:
            failures += 1
            for line in r.stdout.splitlines():
                if line.startswith("FAIL"):
                    print("   ", line[:300])
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
