"""The `gene` golden-schema path — the ONLY recorded expected output
of the reference (GET /filters/gene golden response,
postman_collection.json:102; schema transcribed in FIXTURES.md §1).

Builds the 13-column gene table from the documented schema, registers
it with its `species` mandatory key, and asserts:

- filters("gene") reproduces the golden response shape exactly
  (column Name/Type pairs in order + the two species values);
- the representative postman query shapes (fields subset, equality
  condition, postman_collection.json:180,213) run through the full
  submit→status→preview→export lifecycle.
"""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark.catalog import ColumnInfo
from tests.conftest import SF_DIR

# FIXTURES.md §1 column list (postman golden response order).
GENE_SCHEMA_DDL = (
    ("gene_id", "bigint"),
    ("gene_stable_id", "string"),
    ("gene_stable_id_version", "bigint"),
    ("gene_chr", "string"),
    ("gene_start", "bigint"),
    ("gene_end", "bigint"),
    ("gene_biotype", "string"),
    ("gene_symbol_id", "string"),
    ("gene_symbol", "string"),
    ("canonical_transcript_stable_id", "string"),
    ("canonical_transcript_stable_id_version", "bigint"),
    ("canonical_transcript_biotype", "string"),
    ("species", "string"),
)

GENE_ROWS = [
    # (gene_id, stable_id, ver, chr, start, end, biotype, sym_id, sym, ct_id, ct_ver, ct_bio, species)
    (554, "ENSG00000210049", 1, "MT", 577, 647, "Mt_tRNA", "s1", "MT-TF", "ENST00000387314", 1, "Mt_tRNA", "homo_sapiens"),
    (555, "ENSG00000211459", 1, "MT", 648, 1601, "Mt_rRNA", "s2", "MT-RNR1", "ENST00000389680", 1, "Mt_rRNA", "homo_sapiens"),
    (900, "ENSMUSG00000064336", 1, "MT", 1, 68, "Mt_tRNA", "s3", "mt-Tf", "ENSMUST00000082387", 1, "Mt_tRNA", "mus_musculus"),
]


@pytest.fixture(scope="module")
def gene_engine(spark, tmp_path_factory):
    from ensembl_lakehouse_spark.engine import Engine

    eng = Engine(spark, work_dir=str(tmp_path_factory.mktemp("gene_work")))
    eng.catalog.register_dir(SF_DIR)
    schema = ", ".join(f"{n} {t}" for n, t in GENE_SCHEMA_DDL)
    df = spark.createDataFrame(GENE_ROWS, schema=schema)
    eng.catalog.register_dataframe("gene", df)
    yield eng
    eng.close()


def test_filters_gene_matches_golden_shape(gene_engine):
    resp = gene_engine.filters("gene")
    # Golden response: [{"Name": ..., "Type": ...}] in schema order
    # (reference app/main.py:198 returns Glue's shape verbatim).
    assert resp["columns"] == [
        ColumnInfo(n, t).as_reference_shape() for n, t in GENE_SCHEMA_DDL
    ]
    assert resp["species"] == ["homo_sapiens", "mus_musculus"]


def test_gene_appears_in_data_types(gene_engine):
    assert "gene" in gene_engine.data_types()


def test_postman_query_shapes_lifecycle(gene_engine):
    """postman_collection.json:180,213 — fields subset + equality
    condition, through submit→status→preview→export."""
    resp = gene_engine.submit_query(
        "gene",
        "homo_sapiens",
        fields="gene_id,gene_stable_id",
        condition="gene_id=554 AND gene_stable_id='ENSG00000210049'",
    )
    qid = resp["query_id"]
    assert set(resp["_links"]) == {"self", "status", "preview", "export"}
    gene_engine.registry.wait(qid, timeout=120)
    status = gene_engine.query_status(qid)
    assert status["status"] == "SUCCEEDED"

    prev = gene_engine.query_preview(qid, max_results=5)
    header = [d["VarCharValue"] for d in prev["Rows"][0]["Data"]]
    assert header == ["gene_id", "gene_stable_id"]
    values = [d["VarCharValue"] for d in prev["Rows"][1]["Data"]]
    assert values == ["554", "ENSG00000210049"]
    assert len(prev["Rows"]) == 2  # header + the one matching row

    exp = gene_engine.export(qid, "csv")
    assert exp["status"] in ("QUEUED", "DONE")
    gene_engine.exports.wait_all()
    assert gene_engine.export(qid, "csv")["status"] == "DONE"


def test_full_species_slice(gene_engine):
    resp = gene_engine.submit_query("gene", "homo_sapiens")
    qid = resp["query_id"]
    gene_engine.registry.wait(qid, timeout=120)
    prev = gene_engine.query_preview(qid, max_results=10)
    assert len(prev["Rows"]) == 3  # header + 2 homo_sapiens rows
