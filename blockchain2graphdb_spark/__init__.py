"""PySpark-native analytics engine re-expressing the query and
data-processing capabilities of the reference blockchain->property-graph
ETL pipeline (DimaYakov/blockchain2graphdb, surveyed in SURVEY.md).

Architecture: normalized columnar DataFrames instead of a mutable property
graph; every derived statistic the reference maintains imperatively
(read-modify-write per vertex) is declared here as an aggregation /
window / join query and planned by Catalyst.  See SURVEY.md §1.6 for the
model inversion and §2 for the operator inventory this package covers.
"""

__version__ = "0.1.0"
