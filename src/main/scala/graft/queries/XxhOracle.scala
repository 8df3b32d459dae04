package graft.queries

import graft.operators.Dedup

/**
 * DuckDB-SQL replica of Spark's `xxhash64(seed=42)` — the piece that
 * lets hash-dependent MinHash queries graduate from rows-only to FULL
 * oracle checks (q61's HUGEINT-wraparound rolling-hash replay is the
 * precedent; this generalizes it to the real XXH64 algorithm).
 *
 * DuckDB has no Spark-compatible hash function, but it has UBIGINT
 * (64-bit xor / right-shift are native) and HUGEINT (128-bit signed).
 * Every mod-2⁶⁴ operation is expressed exactly:
 *
 *   - add:   both operands to HUGEINT, sum, `% 2⁶⁴`, back to UBIGINT
 *   - mul:   32×32 schoolbook split — lo·lo + ((lo·hi + hi·lo mod 2³²)
 *            · 2³²) mod 2⁶⁴ — keeps every intermediate < 3·2⁶⁴, inside
 *            HUGEINT range (a naive 64×64 HUGEINT product overflows)
 *   - rotl:  (x·2ʳ mod 2⁶⁴) xor (x >> 64−r) — disjoint bits, so xor
 *            is the `|` of the reference algorithm
 *
 * Sequential state updates run through `list_reduce` (the accumulator
 * is a VALUE per step) and CTE stages (columns materialize between
 * projections), never textual nesting — inlining the 4-round XXH64
 * merge naively multiplies the expression 8× per level.
 *
 * Validated against the reference XXH64 vectors and byte-for-byte
 * against the Scala kernel ([[graft.functions.ShingleExprs]]) across
 * edge lengths incl. ≥32-byte stripe inputs and multi-byte UTF-8;
 * the end-to-end check is the selfcheck/driver DuckDB gate itself,
 * where q9M's result must hash-match this SQL's.
 */
private[queries] object XxhOracle {

  private val M = "18446744073709551616" // 2^64 as a HUGEINT literal
  // XXH64 primes, unsigned decimal (Scala Longs would print signed)
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val SEED = BigInt(42)
  private val M64 = (BigInt(1) << 64) - 1

  private def add(a: String, b: String): String =
    s"((($a)::HUGEINT + ($b)::HUGEINT) % $M)::UBIGINT"

  /** low-64 bits of a·b via 32-bit limb split (see class doc). */
  private def mul(a: String, b: String): String =
    s"((((($a) % 4294967296)::HUGEINT * (($b) % 4294967296)::HUGEINT) + " +
      s"((((($a) % 4294967296)::HUGEINT * (($b) // 4294967296)::HUGEINT + " +
      s"(($a) // 4294967296)::HUGEINT * (($b) % 4294967296)::HUGEINT) % 4294967296) " +
      s"* 4294967296)) % $M)::UBIGINT"

  private def rotl(x: String, r: Int): String =
    s"xor((((($x)::HUGEINT * ${BigInt(1) << r}) % $M)::UBIGINT), (($x) >> ${64 - r}))"

  private def xor(a: String, b: String): String = s"xor(($a), ($b))"

  /** little-endian 8-byte lane at 0-based byte offset `o` of list `bs`. */
  private def lane8(o: String): String =
    (0 until 8).map(j => s"bs[($o)+${j + 1}]::HUGEINT * ${BigInt(1) << (8 * j)}")
      .mkString("(", " + ", ")::UBIGINT")

  private def lane4(o: String): String =
    (0 until 4).map(j => s"bs[($o)+${j + 1}]::HUGEINT * ${BigInt(1) << (8 * j)}")
      .mkString("(", " + ", ")::UBIGINT")

  /** round(acc, lane) = rotl31(acc + lane·P2) · P1 */
  private def rnd(acc: String, lane: String): String =
    mul(rotl(add(acc, mul(lane, P2.toString)), 31), P1.toString)

  /** round(0, acc) — the merge-step inner round. */
  private def rnd0(av: String): String =
    mul(rotl(mul(av, P2.toString), 31), P1.toString)

  /**
   * CTE chain computing xxhash64(s, 42) for every row of a prior CTE
   * `ss(s)`. Final CTE is `hashed(s, h64)` (full unsigned 64 bits;
   * consumers mask to 32 where the kernel does).
   */
  def xxhashCtes: String = {
    val a1 = (SEED + P1 + P2) & M64
    val a2 = (SEED + P2) & M64
    val a3 = SEED
    val a4 = (SEED - P1) & M64
    val stripeLambda =
      s"(acc, ls) -> [${rnd("acc[1]", "ls[1]")}, ${rnd("acc[2]", "ls[2]")}, " +
        s"${rnd("acc[3]", "ls[3]")}, ${rnd("acc[4]", "ls[4]")}]"
    val mergeInit = add(add(rotl("accs[1]", 1), rotl("accs[2]", 7)),
      add(rotl("accs[3]", 12), rotl("accs[4]", 18)))
    val mergeLambda = s"(acc, av) -> ${add(mul(xor("acc", rnd0("av")), P1.toString), P4.toString)}"
    val tail8Lambda = s"(acc, l) -> ${add(mul(rotl(xor("acc", rnd0("l")), 27), P1.toString), P4.toString)}"
    val tail4Lambda = s"(acc, l) -> ${add(mul(rotl(xor("acc", mul("l", P1.toString)), 23), P2.toString), P3.toString)}"
    val tail1Lambda = s"(acc, l) -> ${mul(rotl(xor("acc", mul("l", P5.toString)), 11), P1.toString)}"
    s"""
    hb AS (SELECT s, octet_length(encode(s))::BIGINT AS n,
             list_transform(range(octet_length(encode(s))::INT),
               i -> ('0x' || substr(hex(encode(s)), (2*i+1)::INT, 2))::UBIGINT) AS bs
           FROM ss),
    hst AS (SELECT s, n, bs,
             CASE WHEN n >= 32 THEN
               list_reduce(
                 list_prepend([$a1,$a2,$a3,$a4]::UBIGINT[],
                   list_transform(range((n//32)::INT),
                     j -> [${lane8("32*j")}, ${lane8("32*j+8")}, ${lane8("32*j+16")}, ${lane8("32*j+24")}])),
                 $stripeLambda)
             ELSE NULL END AS accs
            FROM hb),
    hm AS (SELECT s, n, bs, (n//32)*32 AS t0,
             CASE WHEN n >= 32 THEN
               list_reduce(list_prepend($mergeInit, accs), $mergeLambda)
             ELSE ${(SEED + P5) & M64}::UBIGINT END AS acc0
           FROM hst),
    h8 AS (SELECT s, n, bs, t0 + 8*((n-t0)//8) AS t1,
             list_reduce(list_prepend(${add("acc0", "n::UBIGINT")},
               list_transform(range(((n-t0)//8)::INT), j -> ${lane8("t0+8*j")})),
               $tail8Lambda) AS acc8
           FROM hm),
    h4 AS (SELECT s, n, bs, t1 + CASE WHEN n-t1 >= 4 THEN 4 ELSE 0 END AS t2,
             list_reduce(list_prepend(acc8,
               CASE WHEN n-t1 >= 4 THEN [${lane4("t1")}] ELSE []::UBIGINT[] END),
               $tail4Lambda) AS acc4
           FROM h8),
    h1 AS (SELECT s,
             list_reduce(list_prepend(acc4,
               list_transform(range((n-t2)::INT), j -> bs[(t2+j)+1])),
               $tail1Lambda) AS accT
           FROM h4),
    hav1 AS (SELECT s, ${mul(xor("accT", "accT >> 33"), P2.toString)} AS a1 FROM h1),
    hav2 AS (SELECT s, ${mul(xor("a1", "a1 >> 29"), P3.toString)} AS a2 FROM hav1),
    hashed AS (SELECT s, xor(a2, a2 >> 32) AS h64 FROM hav2)"""
  }

  // ---- Spark hash() (Murmur3_x86_32, seed 42) over long columns ----
  // 32-bit arithmetic over BIGINT; multiplications through HUGEINT.
  // Spark folds hash(c1..cn) as h = hashLong(cN, ... hashLong(c1, 42)),
  // each hashLong = mixH1(mixH1(seed, mixK1(lo)), mixK1(hi)) then
  // fmix(·, 8) — validated against `SELECT hash(...)` ground truth.

  private val M32 = "4294967296"

  private def mul32(a: String, b: String): String =
    s"((($a)::HUGEINT * ($b)::HUGEINT) % $M32)::BIGINT"

  private def rotl32(x: String, r: Int): String =
    s"xor(${mul32(x, (1L << r).toString)}, (($x) >> ${32 - r}))"

  private def mixK1(k: String): String =
    mul32(rotl32(mul32(k, "3432918353"), 15), "461845907") // 0xcc9e2d51, 0x1b873593

  private def mixH1(h: String, k: String): String =
    s"((${mul32(rotl32(s"xor(($h), ($k))", 13), "5")} + 3864292196) % $M32)::BIGINT" // + 0xe6546b64

  private def fmix(acc: String): String = {
    val s1 = s"xor(($acc), 8)" // len is always 8 bytes per folded long
    val s2 = s"xor(($s1), ($s1) >> 16)"
    val s3 = mul32(s2, "2246822507") // 0x85ebca6b
    val s4 = s"xor(($s3), ($s3) >> 13)"
    val s5 = mul32(s4, "3266489909") // 0xc2b2ae35
    s"xor(($s5), ($s5) >> 16)"
  }

  /** Murmur step lambda: op = −1 marks the per-long fmix boundary,
    * any other value is a precomputed mixK1 half. */
  private def murmurLambda: String =
    s"(acc, op) -> CASE WHEN op = -1 THEN ${fmix("acc")} ELSE ${mixH1("acc", "op")} END"

  /** Per folded long `l`: its two mixK1 halves plus the fmix marker. */
  private def k1Pair(l: String): String =
    s"[${mixK1(s"(($l) % $M32)")}, ${mixK1(s"(($l) // $M32)")}, -1]"

  /** `hash(sig[4j+1], …, sig[4j+4])` — Spark's band-bucket value for
    * 0-based band `j` over a `sig` list column (LSH banding parity). */
  private def bandBucket: String =
    "list_reduce(list_prepend(42::BIGINT, flatten(list_transform(" +
      s"[sig[4*j+1], sig[4*j+2], sig[4*j+3], sig[4*j+4]], l -> ${k1Pair("l")}))), $murmurLambda)"

  /**
   * Shared CTE chain for the MinHash+LSH family (k=64, 16 bands of 4,
   * matching [[Dedup.minhashCandidates]]' defaults): per-doc sorted
   * shingle-hash sets (`hsl`), signatures (`sigl`), and Spark-hash
   * band buckets (`bb`). Each consumer appends its own candidate
   * condition and verification projection.
   */
  private def lshCommonCtes: String = {
    val k = 64
    val a = Dedup.mixConstants(k, 1, 30)
    val b = Dedup.mixConstants(k, 2, 32)
    val constRows = (0 until k).map(i => s"(${i + 1},${a(i)},${b(i)})").mkString(",")
    s"""
    WITH consts(i, a, b) AS (VALUES $constRows),
    tk AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
    sh AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ts)-1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
           FROM tk WHERE len(ts) >= 3),
    ss AS (SELECT DISTINCT s FROM sh),
    ${xxhashCtes.trim},
    dh AS (SELECT DISTINCT sh.doc_id, (hashed.h64 & 4294967295)::BIGINT AS x
           FROM sh JOIN hashed USING (s)),
    hsl AS (SELECT doc_id, list(DISTINCT x ORDER BY x) AS hs FROM dh GROUP BY doc_id),
    sigs AS (SELECT doc_id, i, min((a * x + b) % ${Dedup.MINHASH_P}) AS m
             FROM dh CROSS JOIN consts GROUP BY doc_id, i),
    sigl AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM sigs GROUP BY doc_id),
    bb AS (SELECT doc_id, j, $bandBucket AS bucket
           FROM sigl CROSS JOIN (SELECT unnest(range(16)) AS j))"""
  }

  /** Bucket-collision candidates under `candCond`, verified with the
    * signature estimate and exact shingle-set Jaccard (the
    * [[Dedup]] `verifyCandidates` replica), then `select` + `tail`. */
  private def lshQuery(candCond: String, select: String, tail: String): String =
    lshCommonCtes + s""",
    cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
             FROM bb x JOIN bb y ON x.j = y.j AND x.bucket = y.bucket AND $candCond),
    ver AS (SELECT id_a, id_b,
              (list_sum(list_transform(range(1, 65), i -> (sa.sig[i] = sb.sig[i])::INT)))::DOUBLE / 64.0::DOUBLE AS est_jaccard,
              len(list_intersect(ha.hs, hb.hs))::DOUBLE /
                  (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs)))::DOUBLE AS jaccard
            FROM cand
              JOIN sigl sa ON sa.doc_id = cand.id_a
              JOIN sigl sb ON sb.doc_id = cand.id_b
              JOIN hsl ha ON ha.doc_id = cand.id_a
              JOIN hsl hb ON hb.doc_id = cand.id_b)
    $select
    $tail"""

  /**
   * FULL oracle for q73: the ENTIRE MinHash+LSH dedup pipeline —
   * bucket-collision candidates, signature-estimate ≥ 0.4 filter,
   * exact shingle-set Jaccard ≥ 0.8, greedy min-id-wins anti-join.
   * Every hash (xxhash64 shingles, murmur band buckets) is replayed
   * exactly, so even 32-bit bucket collisions agree with Spark.
   */
  def q73Sql: String = lshQuery(
    "x.doc_id < y.doc_id",
    """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
       WHERE d.doc_id NOT IN (SELECT id_b FROM ver
         WHERE est_jaccard >= 0.4::DOUBLE AND jaccard >= 0.8::DOUBLE)""",
    "ORDER BY d.doc_id")

  /** FULL oracle for qAY: per-source dedup impact — the q73 keep
    * decision re-aggregated by source with whitespace-token mass. */
  def qAySql: String = lshQuery(
    "x.doc_id < y.doc_id",
    """SELECT d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN dr.id_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(len(regexp_extract_all(d.text, '\S+'))) AS BIGINT) AS tokens_total,
         CAST(SUM(CASE WHEN dr.id_b IS NULL
           THEN len(regexp_extract_all(d.text, '\S+')) ELSE 0 END) AS BIGINT) AS tokens_kept,
         CASE WHEN SUM(len(regexp_extract_all(d.text, '\S+'))) = 0 THEN 0.0
              ELSE round(
                CAST(SUM(CASE WHEN dr.id_b IS NULL
                  THEN len(regexp_extract_all(d.text, '\S+')) ELSE 0 END) AS DOUBLE) /
                CAST(SUM(len(regexp_extract_all(d.text, '\S+'))) AS DOUBLE), 6)
         END AS kept_frac
       FROM documents d LEFT JOIN
         (SELECT DISTINCT id_b FROM ver
          WHERE est_jaccard >= 0.4::DOUBLE AND jaccard >= 0.8::DOUBLE) dr
         ON d.doc_id = dr.id_b
       GROUP BY d.source""",
    "ORDER BY source")

  /** FULL oracle for q52: the near-dup pair report itself — top-50 by
    * exact Jaccard over the estimate-filtered LSH candidates. */
  def q52Sql: String = lshQuery(
    "x.doc_id < y.doc_id",
    "SELECT id_a, id_b, est_jaccard, jaccard FROM ver WHERE est_jaccard >= 0.4::DOUBLE",
    "ORDER BY jaccard DESC, id_a, id_b LIMIT 50")

  /** FULL oracle for q9N: incremental dedup — only pairs touching the
    * new batch (doc_id ≥ 250), exactly
    * [[Dedup.minhashCandidatesIncremental]]'s (new,new) ∪ (new,stored)
    * candidate surface. */
  def q9nSql: String = lshQuery(
    "x.doc_id < y.doc_id AND (x.doc_id >= 250 OR y.doc_id >= 250)",
    "SELECT id_a, id_b, est_jaccard, jaccard FROM ver WHERE est_jaccard >= 0.4::DOUBLE",
    "ORDER BY id_a, id_b")

  /** FULL oracle for q9O: fuzzy decontamination — cross-corpus pairs
    * only (train side doc_id % 29 ≠ 0 × eval side doc_id % 29 = 0, no
    * id ordering), exactly [[Dedup.crossCandidates]]' surface. */
  def q9oSql: String = lshQuery(
    "x.doc_id % 29 != 0 AND y.doc_id % 29 = 0",
    "SELECT id_a, id_b, est_jaccard, jaccard FROM ver WHERE est_jaccard >= 0.4::DOUBLE",
    "ORDER BY id_a, id_b")

  /**
   * FULL oracle for q53: SimHash near-dup pairs. Per-doc signature =
   * sign of per-bit ±1 votes of every token occurrence's xxhash64
   * (strictly-positive vote ⇒ bit set, the kernel's rule). The 4-band
   * pigeonhole banding is COMPLETE at hamming ≤ 3, so the final pair
   * set is exactly all pairs at hamming ≤ 3 — brute-force here (the
   * oracle corpus is small), banded in the engine.
   */
  def q53Sql: String = s"""
    WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS s FROM documents),
    dtok AS (SELECT doc_id, s, count(*) AS cnt FROM tok GROUP BY doc_id, s),
    ss AS (SELECT DISTINCT s FROM dtok),
    ${xxhashCtes.trim},
    votes AS (SELECT doc_id, b, sum(cnt * ((((h64 >> b) & 1)::BIGINT)*2 - 1)) AS v
              FROM dtok JOIN hashed USING (s)
              CROSS JOIN (SELECT unnest(range(64)) AS b)
              GROUP BY doc_id, b),
    bits AS (SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY b) AS bv
             FROM votes GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                list_sum(list_transform(range(1, 65), i -> (a.bv[i] != b.bv[i])::INT))::BIGINT AS hamming
              FROM bits a JOIN bits b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    ORDER BY hamming, id_a, id_b LIMIT 50"""

  /**
   * FULL oracle for q9M: per-source element-wise-min MinHash signature
   * (k=128, same splitmix64 a/b constants and prime modulus as
   * [[Dedup.groupJaccardApprox]]), pairwise position-agreement
   * estimate, zero-estimate pairs dropped. Matches the Spark result
   * byte-for-byte because the shingle hash is the exact xxhash64
   * replica above.
   */
  def q9mSql: String = {
    val k = 128
    val a = Dedup.mixConstants(k, 1, 30)
    val b = Dedup.mixConstants(k, 2, 32)
    val constRows = (0 until k).map(i => s"(${i + 1},${a(i)},${b(i)})").mkString(",")
    s"""
    WITH consts(i, a, b) AS (VALUES $constRows),
    tk AS (SELECT source::VARCHAR AS g, regexp_extract_all(text, '\\S+') AS ts FROM documents),
    sh AS (SELECT DISTINCT g,
             unnest(list_transform(range(1, len(ts)-1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
           FROM tk WHERE len(ts) >= 3),
    ss AS (SELECT DISTINCT s FROM sh),
    ${xxhashCtes.trim},
    gh AS (SELECT DISTINCT sh.g, (hashed.h64 & 4294967295)::BIGINT AS x
           FROM sh JOIN hashed USING (s)),
    sigs AS (SELECT g, i, min((a * x + b) % ${Dedup.MINHASH_P}) AS m
             FROM gh CROSS JOIN consts GROUP BY g, i),
    sigl AS (SELECT g, list(m ORDER BY i) AS sig FROM sigs GROUP BY g),
    pairs AS (SELECT l.g AS g_a, r.g AS g_b,
                list_sum(list_transform(range(1, ${k + 1}), i -> (l.sig[i] = r.sig[i])::INT)) / $k.0 AS est_jaccard
              FROM sigl l JOIN sigl r ON l.g < r.g)
    SELECT g_a, g_b, est_jaccard FROM pairs WHERE est_jaccard > 0 ORDER BY g_a, g_b"""
  }
}
