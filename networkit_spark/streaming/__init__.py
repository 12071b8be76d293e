"""Structured Streaming layer (SURVEY.md §2.11 'Streaming').

The reference's closest concept is the GraphEvent batch stream consumed by
Dyn* algorithms (networkit/cpp/dynamics/, networkit/components.pyx:411-570)
— batch-incremental, not true streaming. This package provides the
Spark-native upgrade: transcript turns as an unbounded stream, watermarked
windowed edge aggregation, a custom stateful operator for cross-batch tool
transitions, and foreachBatch incremental maintenance of graph state.
"""
