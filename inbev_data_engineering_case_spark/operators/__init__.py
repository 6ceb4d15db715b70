"""Operator library: each module is a family from SURVEY.md §2 / §7.

All operators are *expression constructors* or *DataFrame → DataFrame*
functions — they build declarative Catalyst plans and never collect to the
driver, so every one of them scales to arbitrarily many partitions.
"""
