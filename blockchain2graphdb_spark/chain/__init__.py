"""Blockchain data model + derivation pipeline (SURVEY.md §1, §2.9).

The reference maintains a mutable property graph (Block / Transaction /
Output / Address vertices with 20+ derived scalar properties) by
read-modify-write Gremlin traversals. This package is the declarative
inversion: four normalized input tables (schema.py, FIXTURES.md §B) and
every derived property computed as a query (derive.py), with maintenance
semantics as set operations (maintain.py) and the wallet clustering the
reference stubbed implemented via connected components (wallets.py).
"""
