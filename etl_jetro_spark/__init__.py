"""etl_jetro_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``yzysnake/ETL-Jetro`` reference suite.

The reference is a pandas purchasing-automation toolkit (see SURVEY.md); this
package re-expresses its relational semantics — scan → normalize → unpivot →
filter → aggregate → join → derive → sort → ordered sink, plus a streaming
state-machine layer — as idiomatic Spark SQL / DataFrame / Structured
Streaming code designed for 100 TB scale.

Layout
------
- ``functions``  scalar Column expressions (SURVEY §2.8, F1–F15)
- ``normalize``  positional grid ops: header promotion, slicing (§2.2 P1–P12)
- ``operators``  relational core: unpivot, agg, join, sort, dedup, similarity
- ``sources``    ingest: excel/csv/json/sheet readers (§2.1 S1–S6)
- ``sinks``      canonical excel, keystroke-macro, pdf sinks (§2.9 K1–K6)
- ``streaming``  file-watch + PO state machine (§2.1 S7, §2.10 T1–T7)
- ``pipelines``  the six supplier pipelines re-expressed on the engine
"""

__version__ = "0.1.0"

from etl_jetro_spark.session import get_spark  # noqa: F401
