"""Document shred / assemble — Spark-native parity with the reference's core
(A1 saveIntoDatabase DatabaseManager.java:118-241, A2 getObjectFromResultSet
:280-381, A9-A12 structural rules; SURVEY.md §1.2).

Structural rules reproduced (write path):

- primitive field            → typed column (ref :203-204)
- nested object WITH rowNum  → child table named after the field key
                               (ref :154, :453-474); parent stores a real
                               BIGINT FK column ``<field>$rowNum`` instead of
                               the in-band string marker ``{child:N}`` (:470)
- nested object WITHOUT rowNum → ``parent$sub`` flattened columns (ref :162)
- array of objects           → per-``type`` child tables (ref :180-184) with
                               a back-pointer column named after the parent
                               table (ref :233-238); the ``{check:[...]}``
                               manifest (:196-198) becomes the out-of-band
                               ``ShredResult.rels`` list
- array of primitives        → native ArrayType column (reference serializes
                               to a JSON text cell, :191)
- JSON null                  → preserved (reference skips on write and reads
                               SQL NULL back as "", :203/:309-311)

Documented divergences (SURVEY.md §2-A bug list — assert the fix, not the
bug): no in-band markers, so user strings "{child:...}"/"{check:...}"/"[..."
round-trip verbatim; real nulls; native arrays (2-d included, ref :169 TODO);
untyped array elements land in a field-named table instead of being dropped
with a console warning (ref :180-183).

Model limitation (shared with the reference): a collection's relational
schema is the union of observed fields, so *absent* and *null* fields are
equivalent within a collection — a field missing from one document reads
back as null if any sibling document has it.  (The reference collapses the
same pair the other way: both become "" on read, :203/:309-311.)

Key assignment (A8 parity): rows with rowNum <= 0/missing get engine ids.
Root rows use monotonically_increasing_id() — partition-parallel, unique
across a cluster, no coordination (the reference serializes every insert to
read SQLite's last_insert_rowid, :221-223).  Child keys are derived
*deterministically from the parent key* as xxhash64(parent, slot, pos)
mapped into a reserved high range, which both avoids re-evaluation hazards
between the parent's FK column and the child table, and fixes reference
bug #3 (parent storing a grandchild's rowid, SURVEY.md §2-A) by
construction.  (An earlier arithmetic packing, (parent*64+pos)*8+slot,
silently collided for arrays longer than 64 elements; hashing removes the
bound — residual 64-bit-birthday collision odds are ~N²/2^61, negligible
below ~10^8 engine-assigned children per shred and strictly better than a
guaranteed collision.)

Empty arrays of objects DO round-trip (divergence-fix #4, improving on the
reference whose per-element write loop, :180-198, writes nothing for an
empty array and reads it back as absent): posexplode emits no child rows
for ``field: []``, so the parent table keeps an out-of-band boolean marker
column ``<field>$__isempty`` and assemble restores ``[]`` (marker true) vs
``null``/absent (marker false) when the child join finds no rows.

Scale: recursion walks the SCHEMA (driver-side, tiny); all data movement is
DataFrame ops — posexplode for array children, column selects for
flattening.  Assembly is joins + collect_list, one shuffle per child table
on the parent key (vs the reference's SELECT per parent×child, :317-341).
Heterogeneous reassembled arrays use Spark 4 VariantType so mixed child
types render as real JSON elements.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY = "rowNum"
SEP = "$"            # reference's flatten separator (DatabaseManager.java:162)
TYPE_FIELD = "type"  # array-element discriminator (:180-184)
# internal order column on array-child tables: the reference preserves array
# order via its in-band `{check:[...]}` manifest (:196-198); our out-of-band
# equivalent is an explicit element position, which also survives hash-derived
# child keys (the old packed keys were accidentally order-encoding)
POS = "__arraypos"
# parent-side marker distinguishing `field: []` (true) from absent/null
# (false) for struct-array fields, where zero child rows are ambiguous
EMPTY_MARK = "__isempty"

_ROOT_OFFSET = 1_000_000_000
# engine-derived child keys live in [2^62, 2^62 + 2^61): far above root ids
# (monotonically_increasing_id tops out near 2^53 for realistic partition
# counts) and any plausible user-supplied rowNum, so the ranges can't mix
_DERIVED_BASE = 1 << 62
_DERIVED_SPAN = 1 << 61


def _derived_child_key(parent: F.Column, slot: int,
                       pos: F.Column | None = None) -> F.Column:
    """Deterministic engine key for a child row: xxhash64 of (parent key,
    child-field slot, array position) folded into the reserved range.
    Unbounded in array length and fan-out, unlike arithmetic packing."""
    h = F.xxhash64(parent.cast("long"), F.lit(slot),
                   (pos if pos is not None else F.lit(-1)).cast("long"))
    return F.pmod(h, F.lit(_DERIVED_SPAN)) + F.lit(_DERIVED_BASE)


@dataclass
class ChildRel:
    parent: str
    table: str
    kind: str                      # "ref" | "array"
    source_field: str
    type_value: str | None = None


@dataclass
class ShredResult:
    root: str
    tables: dict[str, DataFrame] = field(default_factory=dict)
    rels: list[ChildRel] = field(default_factory=list)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]


def _needs_key(col: F.Column) -> F.Column:
    return col.isNull() | (col <= 0)


def _assign_root_keys(df: DataFrame) -> DataFrame:
    if KEY not in df.columns:
        df = df.withColumn(KEY, F.lit(None).cast("long"))
    k = F.col(KEY).cast("long")
    return df.withColumn(
        KEY,
        F.when(_needs_key(k),
               F.monotonically_increasing_id() + F.lit(_ROOT_OFFSET))
         .otherwise(k))


def shred(df: DataFrame, root: str) -> ShredResult:
    """Normalize a DataFrame of (possibly nested) documents into flat
    relational tables per the reference's structural rules (A1)."""
    result = ShredResult(root=root)
    _shred_level(_assign_root_keys(df), root, result)
    return result


def _shred_level(df: DataFrame, table: str, result: ShredResult) -> None:
    """df must already carry resolved (positive, unique) rowNum keys."""
    ref_children: list[str] = []
    array_children: list[tuple[int, str, T.StructType]] = []
    keep: list[F.Column] = []

    arr_slot = 0
    for f in df.schema.fields:
        dt = f.dataType
        if f.name == KEY:
            keep.append(F.col(KEY).cast("long").alias(KEY))
        elif isinstance(dt, T.StructType) and any(x.name == KEY for x in dt.fields):
            ref_children.append(f.name)
        elif isinstance(dt, T.StructType):
            for sub in dt.fields:
                keep.append(F.col(f"{f.name}.{sub.name}")
                            .alias(f"{f.name}{SEP}{sub.name}"))
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            array_children.append((arr_slot, f.name, dt.elementType))
            arr_slot += 1
            keep.append((F.col(f.name).isNotNull() & (F.size(f.name) == 0))
                        .alias(f"{f.name}{SEP}{EMPTY_MARK}"))
        else:
            keep.append(F.col(f.name))

    # resolve ref-child keys deterministically from the parent key, in the
    # parent plan, so the FK column and the child table agree by construction
    for slot, name in enumerate(ref_children):
        ck = F.col(f"{name}.{KEY}").cast("long")
        resolved = F.when(
            _needs_key(ck),
            _derived_child_key(F.col(KEY), slot)).otherwise(ck)
        df = df.withColumn(
            name,
            F.when(F.col(name).isNull(), F.col(name))
             .otherwise(F.col(name).withField(KEY, resolved)))
        keep.append(F.col(f"{name}.{KEY}").alias(f"{name}{SEP}{KEY}"))

    result.tables[table] = df.select(*keep)

    for name in ref_children:
        child_df = df.filter(F.col(name).isNotNull()).select(F.col(f"{name}.*"))
        result.rels.append(ChildRel(parent=table, table=name, kind="ref",
                                    source_field=name))
        _shred_level(child_df, name, result)

    for slot, name, elem in array_children:
        exploded = (
            df.select(F.col(KEY).alias("__pk"),
                      F.posexplode(name).alias("__pos", "__e"))
            .select("__pk", "__pos", F.col("__e.*")))
        assert POS not in exploded.columns[2:], (
            f"user field collides with reserved order column {POS!r}")
        if KEY not in exploded.columns:
            exploded = exploded.withColumn(KEY, F.lit(None).cast("long"))
        ck = F.col(KEY).cast("long")
        exploded = (
            exploded.withColumn(
                KEY,
                F.when(_needs_key(ck),
                       _derived_child_key(F.col("__pk"), slot,
                                          pos=F.col("__pos")))
                 .otherwise(ck))
            .withColumnRenamed("__pk", table)
            .withColumnRenamed("__pos", POS))
        has_type = any(f.name == TYPE_FIELD for f in elem.fields)
        if has_type:
            # bounded driver-side collect: the set of document types is small
            # by design (one child table per type, ref :180-184)
            type_values = sorted(
                r[0] for r in exploded.select(TYPE_FIELD).distinct().collect()
                if r[0] is not None)
            for tv in type_values:
                child = exploded.filter(F.col(TYPE_FIELD) == tv)
                result.rels.append(ChildRel(parent=table, table=tv,
                                            kind="array", source_field=name,
                                            type_value=tv))
                _shred_level(child, tv, result)
        else:
            result.rels.append(ChildRel(parent=table, table=name, kind="array",
                                        source_field=name, type_value=None))
            _shred_level(exploded, name, result)


def assemble(result: ShredResult, table: str | None = None, *,
             compat_null_as_empty: bool = False) -> DataFrame:
    """Rebuild nested documents from shredded tables (A2 parity).

    compat_null_as_empty reproduces the reference's lossy null round-trip
    (SQL NULL read back as "", DatabaseManager.java:309-311) for string
    columns — OFF by default; the engine-native behavior keeps real nulls
    (SURVEY.md §2-A14 documented divergence)."""
    table = table or result.root
    df = result.tables[table]
    if compat_null_as_empty:
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StringType):
                df = df.withColumn(f.name, F.coalesce(F.col(f.name), F.lit("")))

    # regroup $-columns into sub-object structs (ref :289-307) — FK columns
    # (`<child>$rowNum`) are consumed by the ref-join below, not regrouped
    fk_cols = {f"{r.table}{SEP}{KEY}" for r in result.rels
               if r.parent == table and r.kind == "ref"}
    marker_cols = {f"{r.source_field}{SEP}{EMPTY_MARK}" for r in result.rels
                   if r.parent == table and r.kind == "array"}
    flat_groups: dict[str, list[str]] = {}
    plain: list[str] = []
    for c in df.columns:
        if c in fk_cols or c in marker_cols:
            continue
        if SEP in c:
            flat_groups.setdefault(c.split(SEP, 1)[0], []).append(c)
        else:
            plain.append(c)

    sel: list[F.Column] = [F.col(c) for c in plain]
    for parent_field, cols in flat_groups.items():
        # a sub-object whose every column is NULL was absent from this
        # document (schema union) — restore null, not an empty struct
        all_null = F.col(cols[0]).isNull()
        for c in cols[1:]:
            all_null = all_null & F.col(c).isNull()
        sel.append(
            F.when(all_null, F.lit(None)).otherwise(
                F.struct(*[F.col(c).alias(c.split(SEP, 1)[1]) for c in cols]))
            .alias(parent_field))

    # ref children (ref :312-326): FK join to the recursively assembled child
    for rel in (r for r in result.rels
                if r.parent == table and r.kind == "ref"):
        child = assemble(result, rel.table)
        child_struct = child.select(
            F.col(KEY).alias("__ck"),
            F.struct(*[F.col(c) for c in child.columns]).alias(rel.table))
        df = df.join(child_struct,
                     df[f"{rel.table}{SEP}{KEY}"] == child_struct["__ck"],
                     "left").drop("__ck")
        sel.append(F.col(rel.table))

    # array children (ref :327-348): per-type tables re-merged into ONE array
    # field as variants (heterogeneous element schemas), ordered by child key
    by_field: dict[str, list[ChildRel]] = {}
    for rel in (r for r in result.rels
                if r.parent == table and r.kind == "array"):
        by_field.setdefault(rel.source_field, []).append(rel)
    for field_name, rels in by_field.items():
        parts = []
        for rel in rels:
            child = assemble(result, rel.table)
            elem_cols = [c for c in child.columns if c not in (table, POS)]
            parts.append(child.select(
                F.col(table).alias("__pk"),
                F.col(POS).cast("long").alias("__ck"),
                F.parse_json(F.to_json(F.struct(*[F.col(c) for c in elem_cols])))
                 .alias("__elem")))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        grouped = (
            merged.groupBy("__pk")
            .agg(F.array_sort(F.collect_list(F.struct("__ck", "__elem")),
                              lambda a, b: F.when(a["__ck"] < b["__ck"], -1)
                              .when(a["__ck"] > b["__ck"], 1).otherwise(0))
                 .alias("__tmp"))
            .select("__pk",
                    F.transform("__tmp", lambda s: s["__elem"]).alias(field_name)))
        df = df.join(grouped, df[KEY] == grouped["__pk"], "left").drop("__pk")
        # no child rows joined: `[]` if the marker says the array was present
        # but empty, else null (absent/null — schema-union collapse)
        marker = f"{field_name}{SEP}{EMPTY_MARK}"
        if marker in df.columns:     # absent on pre-marker persisted tables
            empty_arr = F.array().cast(T.ArrayType(T.VariantType()))
            sel.append(
                F.when(F.col(field_name).isNotNull(), F.col(field_name))
                 .when(F.col(marker), empty_arr)
                 .otherwise(F.lit(None).cast(T.ArrayType(T.VariantType())))
                 .alias(field_name))
        else:
            sel.append(F.col(field_name))

    return df.select(*sel)


def to_documents(df: DataFrame) -> DataFrame:
    """Render assembled rows as JSON documents, one per line (A2 output
    shape; pairs with the b1.8 JSON-lines sink).  ignoreNullFields=false:
    real nulls survive the round trip (divergence from ref :203/:309-311
    which drops them on write and coerces to "" on read)."""
    cols = [c for c in df.columns if c != POS]
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in cols]),
                  {"ignoreNullFields": "false"}).alias("doc"))
