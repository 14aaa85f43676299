#!/usr/bin/env python3
"""Generate the deterministic rag_results fixture (FIXTURES.md section B2):
24 rows hitting every safety-fusion/override branch and the SURVEY 2.4
parser quirks, as JSONL (source of truth, human-readable) + parquet (for
the DuckDB oracle). Also prints the hand-checkable golden confusion counts
and metrics for the spec.

One-off tool: rerunning reproduces byte-identical outputs (no randomness).
"""
import json, itertools

rows = []
rid = 0

# 16 systematic rows: every (label, cf_use.pred, cf_quality.pred, rag.reject)
for label, du, dq, rej in itertools.product(
        ["keep", "discard"], ["keep", "discard"], ["keep", "discard"], [False, True]):
    rows.append({
        "id": rid,
        "answer": [f"gold answer {rid}", f"alt {rid} or alias {rid}"],
        "label_decision": label,
        "pred_decision": "discard",  # stale stored value; pipeline recomputes
        "rag": {"reject": rej, "answer": f"rag answer {rid}",
                "evidence": f"Passage-1", "EM": 1 if label == "keep" else 0,
                "F1": 0.8 if label == "keep" else 0.1,
                "RL": 0.75, "has_answer": label == "keep"},
        "cf_use": {"reject": False, "answer": f"rag answer {rid}" if du == "keep" else "something else",
                   "evidence": "Passage-1", "EM": 0, "F1": 0.0, "RL": 0.0,
                   "has_answer": False, "pred_decision": du},
        "cf_quality": {"reject": False, "answer": f"rag answer {rid}" if dq == "keep" else "other",
                       "evidence": "Passage-2", "EM": 0, "F1": 0.0, "RL": 0.0,
                       "has_answer": False, "pred_decision": dq},
    })
    rid += 1

# 8 quirk rows: empty/None answers (Python truthiness), evidence-path
# decisions, ##-span evidence, multi-Passage slices, unicode, " or " refs.
quirks = [
    # (label, du, dq, rej, rag_answer, rag_evi, use_answer, use_evi)
    ("keep", "keep", "keep", False, "", "Passage-1", "", "Passage-1"),          # empty answers -> evidence path
    ("keep", "keep", "keep", False, None, None, None, None),                     # null everything
    ("discard", "keep", "keep", False, "Café au thé", "Passage-2", "Café au thé", "Passage-2"),  # NFD/unicode
    ("keep", "discard", "discard", False, "answer one or answer two", "## span evidence ##", "nope", "Passage-1, Passage-2"),
    ("discard", "discard", "keep", True, "The answer.", "Passage-1", "the answer", "Passage-1"),
    ("keep", "keep", "discard", True, "A: x", "Passage-3", "A: x", "Passage-3"),
    ("discard", "discard", "discard", False, "sorry, I cannot answer", "Passage-1", "unknown", "Passage-1"),
    ("keep", "keep", "keep", True, "42", "Passage-1", "42", "Passage-1"),
]
for label, du, dq, rej, ra, re_, ua, ue in quirks:
    rows.append({
        "id": rid,
        "answer": [f"gold {rid} or golden {rid}"],
        "label_decision": label,
        "pred_decision": "keep",
        "rag": {"reject": rej, "answer": ra, "evidence": re_,
                "EM": 0, "F1": 0.5, "RL": 0.5, "has_answer": False},
        "cf_use": {"reject": False, "answer": ua, "evidence": ue,
                   "EM": 0, "F1": 0.0, "RL": 0.0, "has_answer": False,
                   "pred_decision": du},
        "cf_quality": {"reject": False, "answer": ua, "evidence": ue,
                       "EM": 0, "F1": 0.0, "RL": 0.0, "has_answer": False,
                       "pred_decision": dq},
    })
    rid += 1

# golden: safety fusion + reject override -> confusion + metrics
AK = AD = UK = UD = 0
for r in rows:
    du, dq = r["cf_use"]["pred_decision"], r["cf_quality"]["pred_decision"]
    pred = du if du == dq else ("discard" if "discard" in (du, dq) else "keep")
    if pred == "keep" and r["rag"]["reject"]:
        pred = "discard"
    lab = r["label_decision"]
    if lab == "keep" and pred == "keep": AK += 1
    elif lab == "keep": AD += 1
    elif pred == "keep": UK += 1
    else: UD += 1
n = AK + AD + UK + UD
print(f"golden: AK={AK} AD={AD} UK={UK} UD={UD}")
print(f"risk={UK/(AK+UK):.4f} overcaution={AD/(UD+AD):.4f} recall={AK/(AK+AD):.4f}")
print(f"carefulness={UD/(UK+UD):.4f} alignment={(AK+UD)/n:.4f} coverage={(AK+UK)/n:.4f}")

with open("src/test/resources/rag_results.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")

# parquet with explicit schema via pyarrow (mirrors Schemas.resultRecord)
import pyarrow as pa
import pyarrow.parquet as pq

branch = lambda dec: pa.struct(
    [("reject", pa.bool_()), ("answer", pa.string()), ("evidence", pa.string()),
     ("EM", pa.int32()), ("F1", pa.float64()), ("RL", pa.float64()),
     ("has_answer", pa.bool_())] + ([("pred_decision", pa.string())] if dec else []))
schema = pa.schema([
    ("id", pa.int64()), ("answer", pa.list_(pa.string())),
    ("label_decision", pa.string()), ("pred_decision", pa.string()),
    ("rag", branch(False)), ("cf_use", branch(True)), ("cf_quality", branch(True))])
table = pa.Table.from_pylist(rows, schema=schema)
pq.write_table(table, "src/test/resources/rag_results.parquet")
print(f"wrote {len(rows)} rows")
