"""Expression-level evaluate-once binding.

Catalyst's project collapsing inlines a named expression into EVERY
consumer (a filter + a size() + an explode each get their own copy),
and whole-stage codegen does not eliminate common subexpressions
across operators — so an expensive expression (regex tokenizer,
shingle builder) referenced n times is EVALUATED n times per row.
Measured on this engine before the fix: 7 tokenizer runs per row in
one executed plan (dedup pipeline), 57 in another (language-ID's
score CASE chain).

`bind_once` is the engine-wide idiom that stops it: wrap the value in
a single-element array and build the result inside a higher-order
-function lambda. HOFs evaluate the element once and BIND it to the
lambda variable, so every reference inside the body reads the bound
value. The construction stays JVM-side and codegen-compatible — this
is a let-binding for Spark SQL expressions, not a UDF.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(value: Column, build: Callable[[Column], Column]) -> Column:
    """``let v = value in build(v)``: evaluate ``value`` once per row,
    no matter how many times ``build``'s result references it."""
    return F.element_at(F.transform(F.array(value), build), 1)
