#!/usr/bin/env python3
"""One-shot mechanical splitter for queries/Pipeline.scala (round 19).

Moves the eval/preference/stat family (qBT-qBZ chat/pref subset, qC*, qD*)
to PipelineEval.scala and the exact-twin/capstone qE* family to
PipelineExact.scala, leaving Pipeline.scala as the curation family plus
the concatenation. Entry boundaries are the 4-space-indent `"qXX_..." ->`
anchors with their contiguous preceding `//` comments.
"""
import re, sys

SRC = "src/main/scala/graft/queries/Pipeline.scala"
lines = open(SRC).read().split("\n")  # 0-indexed

ENTRY_RE = re.compile(r'^    "(q[0-9A-Z][0-9A-Za-z_]*)" -> ')

def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit("not found")

q_map_start = find_line(lambda l: l.startswith("  val queries: Map[String, Q] = Map("))
# queries map closes at the first line that is exactly "  )" after start
q_map_end = find_line(lambda l: l == "  )", q_map_start)
o_map_start = find_line(lambda l: l.startswith("  val oracleSql: Map[String, String] = Map("))
o_map_end = find_line(lambda l: l.startswith('  ).map { case (k, v) ->') or
                      l.startswith("  ).map { case (k, v) =>"), o_map_start)

def parse_entries(body_start, body_end):
    """Return list of (qid, start_line, end_line_exclusive) covering
    body lines; comments/blank lines attach to the FOLLOWING entry."""
    anchors = []
    for i in range(body_start + 1, body_end):
        m = ENTRY_RE.match(lines[i])
        if m:
            anchors.append((i, m.group(1)))
    entries = []
    for idx, (i, qid) in enumerate(anchors):
        # walk back over attached comments/blanks
        s = i
        while s - 1 > body_start and (
                lines[s - 1].strip() == "" or lines[s - 1].lstrip().startswith("//")):
            s -= 1
        end = anchors[idx + 1][0] if idx + 1 < len(anchors) else body_end
        # the next entry's attached comments belong to IT, trim them off
        if idx + 1 < len(anchors):
            e = end
            while e - 1 > i and (lines[e - 1].strip() == "" or
                                 lines[e - 1].lstrip().startswith("//")):
                e -= 1
            end = e
        entries.append((qid, s, end))
    # sanity: contiguous coverage
    prev = entries[0][1]
    for qid, s, e in entries:
        assert s == prev, f"gap before {qid}: {prev} vs {s}"
        prev = e
    assert prev == body_end, f"tail gap: {prev} vs {body_end}"
    return entries

EVAL_RE = re.compile(r'^q(BT|BU|BV|BW|BX|BY|BZ|C[0-9A-Z]|D[0-9A-Z])_')
EXACT_RE = re.compile(r'^qE')

def family(qid):
    if EXACT_RE.match(qid):
        return "exact"
    if EVAL_RE.match(qid):
        return "eval"
    return "core"

q_entries = parse_entries(q_map_start, q_map_end)
o_entries = parse_entries(o_map_start, o_map_end)

def chunk(entries, fam):
    out = []
    for qid, s, e in entries:
        if family(qid) == fam:
            seg = lines[s:e]
            # ensure the entry ends with a comma (last map entry may not)
            # find last non-empty line
            j = len(seg) - 1
            while seg[j].strip() == "":
                j -= 1
            if not seg[j].rstrip().endswith(","):
                seg[j] = seg[j].rstrip() + ","
            out.extend(seg)
    # strip the trailing comma of the final entry
    j = len(out) - 1
    while out[j].strip() == "":
        j -= 1
    assert out[j].rstrip().endswith(",")
    out[j] = out[j].rstrip()[:-1]
    return out

# helper-region blocks (between q_map_end and o_map_start), classified by
# their leading identifier
helper_start = q_map_end + 1
helper_end = o_map_start
HELPER_FAMILY = {
    "STOP_IN": "core", "PR_ITERS": "core", "PR_DAMP": "core",
    "PR_BASE": "core", "qBSSql": "core", "qBRSql": "core",
    "MINK_KFRAC": "eval", "MINK_THRESHOLD": "eval",
    "SFT_MIN_TRAINABLE": "eval", "inContextFixture": "eval",
    "PREF_MAX_JAC": "eval", "prefFixture": "eval", "btOracleSql": "eval",
    "powerIterOracleSql": "eval", "INCTX_PIECES": "eval",
    "PREF_PIECES": "eval", "chatFixture": "eval", "CHAT_PIECES": "eval",
    "exactLloydCtes": "exact", "qE0Sql": "exact", "qE1Sql": "exact",
    "qE2Sql": "exact", "qE3Sql": "exact", "qE4Sql": "exact",
    "qE5Sql": "exact", "qE6Sql": "exact",
}
DEF_RE = re.compile(r'^  private (?:def|val|lazy val) (\w+)')
blocks = []  # (name, start, end)
starts = []
for i in range(helper_start, helper_end):
    m = DEF_RE.match(lines[i])
    if m:
        starts.append((i, m.group(1)))
for idx, (i, name) in enumerate(starts):
    s = i
    # attach preceding doc comment / blank lines
    while s - 1 >= helper_start and (
            lines[s - 1].strip() == "" or lines[s - 1].lstrip().startswith("//")
            or lines[s - 1].lstrip().startswith("/**")
            or lines[s - 1].lstrip().startswith("*")):
        s -= 1
    end = starts[idx + 1][0] if idx + 1 < len(starts) else helper_end
    if idx + 1 < len(starts):
        e = end
        while e - 1 > i and (lines[e - 1].strip() == "" or
                             lines[e - 1].lstrip().startswith("//") or
                             lines[e - 1].lstrip().startswith("/**") or
                             lines[e - 1].lstrip().startswith("*")):
            e -= 1
        end = e
    blocks.append((name, s, end))
prev = blocks[0][1]
for name, s, e in blocks:
    assert s == prev, f"helper gap before {name}: {prev} vs {s}"
    prev = e
assert prev == helper_end, f"helper tail gap {prev} vs {helper_end}"
for name, _, _ in blocks:
    assert name in HELPER_FAMILY, f"unclassified helper {name}"

def helpers_for(fam):
    out = []
    for name, s, e in blocks:
        if HELPER_FAMILY[name] == fam:
            out.extend(lines[s:e])
    return out

HEADER = """package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
"""

def emit(path, obj, doc, fam, extra_imports=""):
    qs = chunk(q_entries, fam)
    os_ = chunk(o_entries, fam)
    hs = helpers_for(fam)
    body = [HEADER.rstrip()] + ([extra_imports] if extra_imports else [])
    body += ["", doc, f"object {obj} {{",
             "  type Q = (SparkSession, String) => DataFrame", "",
             "  private def T(s: SparkSession, dir: String)(n: String): DataFrame =",
             "    Tables.load(s, dir, n)", "",
             "  val queries: Map[String, Q] = Map("]
    body += qs
    body += ["  )", ""]
    body += hs
    body += ["", "  val oracleSql: Map[String, String] = Map("]
    body += os_
    body += ['  ).map { case (k, v) => k -> v.trim.replaceAll("\\\\s+", " ") }',
             "}", ""]
    open(path, "w").write("\n".join(body))
    print(f"{path}: {len(qs)} query lines, {len(os_)} oracle lines, "
          f"{len(hs)} helper lines")

emit("src/main/scala/graft/queries/PipelineEval.scala", "PipelineEval",
     """/**
 * Eval/preference/statistics query family (split from Pipeline.scala,
 * round 19): chat/SFT/preference fixtures (qBT-qBZ subset), the qC*
 * eval-analytics block, and the qD* significance/statistics block.
 */""", "eval",
     "import graft.operators.{Similarity, TextAnalysis}")

emit("src/main/scala/graft/queries/PipelineExact.scala", "PipelineExact",
     """/**
 * Exact fixed-point twin + capstone query family (split from
 * Pipeline.scala, round 19): the qE* block - integer-Lloyd index twins
 * (qE0-qE2, qE4), the significance capstone (qE3), changepoint (qE5)
 * and the event funnel (qE6), with their chained-CTE DuckDB oracles.
 */""", "exact",
     "import graft.operators.Similarity")

# rebuild Pipeline.scala: core query entries, core helpers, core oracle
# entries, with the family concatenation appended to both maps
new = []
new += lines[:q_map_start + 1]
new += chunk(q_entries, "core")
new += ["  ) ++ PipelineEval.queries ++ PipelineExact.queries", ""]
new += helpers_for("core")
new += ["", "  val oracleSql: Map[String, String] = Map("]
new += chunk(o_entries, "core")
new += ['  ).map { case (k, v) => k -> v.trim.replaceAll("\\\\s+", " ") } ++',
        "    PipelineEval.oracleSql ++ PipelineExact.oracleSql",
        "}", ""]
open(SRC, "w").write("\n".join(new))
print(f"{SRC}: rewritten, {len(new)} lines")
