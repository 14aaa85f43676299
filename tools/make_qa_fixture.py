#!/usr/bin/env python3
"""Generate qa_samples.jsonl (FIXTURES.md section B1): ~20 deterministic QA
source samples covering multi-answer references, " or " compounds,
CJK/accented text, and answers that appear verbatim / token-wise / not at
all in the passages. Byte-identical on rerun."""
import json

rows = []
def add(question, reference, passages):
    rows.append({
        "id": len(rows), "question": question, "reference": reference,
        "sparse_ctxs": passages, "dense_ctxs": passages, "gold_ctxs": passages})

add("What fruit is red?", ["apple"], ["The apple is red.", "Bananas are yellow.", "Cherries too."])
add("Capital of France?", ["Paris", "paris city"], ["Paris is the capital of France.", "Lyon is not.", "Nice is south."])
add("Who wrote Hamlet?", ["Shakespeare or The Bard"], ["Hamlet was written by Shakespeare.", "It is a tragedy.", "Denmark setting."])
add("Best drink?", ["thé or café"], ["Il aime le thé.", "Elle préfère le café.", "L'eau est bien."])
add("中文问题?", ["中文"], ["这是中文测试。", "这是另一个段落。", "第三段。"])
add("Token-wise only?", ["new york"], ["The New York skyline.", "A big city.", "East coast."])
add("Absent answer?", ["zanzibar"], ["Nothing relevant here.", "Still nothing.", "Nope."])
add("Multi or?", ["a or b or c"], ["Maybe a.", "Maybe b.", "Maybe c."])
add("Punctuated?", ["U.S.A."], ["The U.S.A. is large.", "Other countries exist.", "Filler."])
add("Accented entity?", ["naïveté"], ["Her naïveté was charming.", "Filler one.", "Filler two."])
add("Numbers?", ["42"], ["The answer is 42.", "Or is it 43?", "No, 42."])
add("Empty-ish?", [""], ["Some passage.", "Another.", "Third."])
add("Article answer?", ["the answer"], ["It is the answer.", "Filler.", "More filler."])
add("Case test?", ["APPLE"], ["I like apple pie.", "Filler.", "Filler."])
add("Long answer?", ["quick brown fox"], ["The quick brown fox jumps.", "Over the dog.", "Lazy dog."])
add("Hyphenated?", ["new-york"], ["new-york city lights.", "Filler.", "Filler."])
add("Or with originals?", ["x or y", "z"], ["x marks the spot.", "y not.", "z final."])
add("Only two passages?", ["short"], ["short passage.", "second one."])
add("Repeated answer?", ["echo"], ["echo echo echo.", "Filler.", "Filler."])
add("Unicode spaces?", ["rendez vous"], ["Le rendez vous est pris.", "Filler.", "Filler."])

with open("src/test/resources/qa_samples.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")
print(f"wrote {len(rows)} rows")

# parquet twin for DuckDB oracles (same pattern as rag_results.parquet):
# the driver's oracle SQL reads this path directly.
import duckdb
duckdb.sql(
    "COPY (SELECT * FROM read_json_auto('src/test/resources/qa_samples.jsonl') ORDER BY id) "
    "TO 'src/test/resources/qa_samples.parquet' (FORMAT PARQUET)")
print("wrote qa_samples.parquet")
