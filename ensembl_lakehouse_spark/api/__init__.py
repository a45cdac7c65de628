"""HTTP/HAL API layer (SURVEY §2.2 — the reference's 8 endpoints)."""

from ensembl_lakehouse_spark.api.http import ApiServer, make_handler  # noqa: F401
