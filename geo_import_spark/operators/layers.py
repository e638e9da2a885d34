"""Layer merge — the engine's equivalent of the reference Merger:
partition a parsed-feature stream into homogeneous layers keyed by
(ordered raw column names, ctypes with null-wildcard, CRS), refine
null-typed columns, launder/dedupe output names.

Parity targets:
- layer identity / belongsIn: es6-lib/decoders/layer.js:135-154
- monotone null-type refinement: layer.js:214-236
- layer creation order: merger.js:50-64 (stream order — here the
  deterministic distributed equivalent: first occurrence in
  (doc_id, span_offset) order)
- name laundering + dedup + the_geom rename: soql/soql.js:5-18,
  layer.js:58-74, transform.js:56-58

Physical plan: the per-row fingerprint is a JVM-side JSON of
(geom ctype, [(rawName, ctype)…], crs). Distinct fingerprints are
collected to the driver (bounded by schema diversity, not data size),
unified with the reference's sequential algorithm, and the resulting
fingerprint → layer map is broadcast back — one narrow projection, no
extra shuffle over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_import_spark.soql import naming

# GeoJSON type -> SoQL ctype (soql/mapper.js:16-48)
GEOM_CTYPE = {
    "Point": "point",
    "LineString": "linestring",
    "Polygon": "polygon",
    "MultiPoint": "multipoint",
    "MultiLineString": "multilinestring",
    "MultiPolygon": "multipolygon",
}
# ctype -> output dataTypeName (class-name slice, soql/soql.js:30-32)
DATA_TYPE_NAME = {
    "point": "point",
    "linestring": "line",
    "polygon": "polygon",
    "multipoint": "multipoint",
    "multilinestring": "multiline",
    "multipolygon": "multipolygon",
    "string": "text",
    "number": "number",
    "boolean": "checkbox",
    "null": "text",
    "array": "array",
}


# layer.js:77-79 — the uid sentinel for layers the caller's spec
# didn't pre-assign one to
EMPTY_UID = "__empty__"


@dataclass
class LayerSchema:
    layer_idx: int
    crs: str
    geom_ctype: str  # 'null' until a typed geometry refines it
    columns: list  # [(rawName, ctype), ...] post-refinement, geom excluded
    fingerprints: list = field(default_factory=list)
    # user-supplied layer spec assigned by first-seen position
    # (merger.js:72 `this._specs[this._layers.length]`)
    spec: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        """Spec name, else positional default (layer.js:122-123)."""
        return self.spec.get("name") or f"layer_{self.layer_idx}"

    @property
    def uid(self) -> str:
        """Spec uid, else the EMPTY sentinel (layer.js:126-127)."""
        return self.spec.get("uid") or EMPTY_UID

    @property
    def out_names(self) -> list[str]:
        """Laundered + deduped output column names, the_geom first."""
        raw = [naming.GEOM_NAME] + [
            naming.launder(naming.rename_attribute(n)) for n, _ in self.columns
        ]
        return naming.dedupe(raw)

    @property
    def geom_type_name(self) -> str:
        return DATA_TYPE_NAME[self.geom_ctype]


# Control-char separators for the fingerprint string: \x1d between the
# (geom, names, ctypes, crs) sections, \x1e between list elements.
# Raw property names/ctypes never contain control chars (they come from
# JSON keys / the fixed ctype vocabulary), so the encoding is injective.
_FP_SEC = "\x1d"
_FP_ELEM = "\x1e"


def fingerprint_col():
    """JVM-side row fingerprint: geometry ctype + ordered raw
    (name, ctype) pairs + crs.

    Built entirely from codegen-native expressions: `props.name` /
    `props.ctype` are GetArrayStructFields (no lambda), joined with a
    control-char separator. The previous to_json(transform(props, ...))
    form evaluated an interpreted higher-order lambda per element —
    ~9 s per pass over 150k rows at sf0.1 vs sub-second for this form
    (and merge_layers makes two passes)."""
    geom_ct = F.coalesce(
        *[
            F.when(F.col("geom.gtype") == g, F.lit(c))
            for g, c in GEOM_CTYPE.items()
        ],
        F.lit("null"),
    )
    # concat_ws SKIPS null args (section misalignment), so every
    # section is null-guarded even though props is non-null by schema
    return F.concat_ws(
        _FP_SEC,
        geom_ct,
        F.coalesce(F.array_join(F.col("props.name"), _FP_ELEM), F.lit("")),
        F.coalesce(F.array_join(F.col("props.ctype"), _FP_ELEM), F.lit("")),
        F.coalesce(F.col("crs"), F.lit("")),
    )


def _matches(cols_a: list, cols_b: list) -> bool:
    """belongsIn column check: same ordered raw names, ctypes equal or
    either side null (layer.js:135-154)."""
    if len(cols_a) != len(cols_b):
        return False
    for (na, ta), (nb, tb) in zip(cols_a, cols_b):
        if na != nb:
            return False
        if ta != tb and ta != "null" and tb != "null":
            return False
    return True


def unify_fingerprints(fps_in_order: list[dict]) -> list[LayerSchema]:
    """The reference merger fold at fingerprint granularity: for each
    distinct fingerprint (in first-occurrence order) find the first
    matching layer (null-wildcard), refine its null types, else open a
    new layer."""
    layers: list[LayerSchema] = []
    for fp_str in fps_in_order:
        g, names_s, ctypes_s, crs = fp_str.split(_FP_SEC)
        names = names_s.split(_FP_ELEM) if names_s else []
        ctypes = ctypes_s.split(_FP_ELEM) if ctypes_s else []
        cols = list(zip(names, ctypes))
        target = None
        for layer in layers:
            if layer.crs != crs:
                continue
            geom_ok = (
                layer.geom_ctype == g or layer.geom_ctype == "null" or g == "null"
            )
            if geom_ok and _matches(layer.columns, cols):
                target = layer
                break
        if target is None:
            layers.append(
                LayerSchema(len(layers), crs, g, cols, fingerprints=[fp_str])
            )
        else:
            target.fingerprints.append(fp_str)
            if target.geom_ctype == "null" and g != "null":
                target.geom_ctype = g
            target.columns = [
                (n, t_new if t_old == "null" and t_new != "null" else t_old)
                for (n, t_old), (_, t_new) in zip(target.columns, cols)
            ]
    return layers


def merge_layers(parsed: DataFrame, specs: list | None = None):
    """parsed features (doc_id, span_offset, geom, props, crs, error)
    -> (assigned DataFrame with layer_idx column, [LayerSchema]).

    `specs` is the user's per-position layer spec list (merger.js:72:
    `spec = this._specs[this._layers.length]` — i.e. the spec at the
    position the layer is OPENED at, in first-seen order). Each spec
    is a dict ({"name": ..., "uid": ...}) or a bare string shorthand
    for {"name": ...}; positions past the end of the list get the
    empty spec, so names fall back to `layer_<idx>` (layer.js:122).

    Error rows are excluded (they flow to the error side-channel)."""
    ok = parsed.filter(F.col("error").isNull())
    with_fp = ok.withColumn("fp", fingerprint_col())
    firsts = (
        with_fp.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "span_offset")).alias("first_key"))
        .orderBy("first_key")
        .select("fp")
        .collect()
    )
    layers = unify_fingerprints([r["fp"] for r in firsts])
    for layer in layers:
        spec = specs[layer.layer_idx] if specs and layer.layer_idx < len(specs) else {}
        layer.spec = {"name": spec} if isinstance(spec, str) else dict(spec or {})
    fp_to_idx = {fp: layer.layer_idx for layer in layers for fp in layer.fingerprints}
    if fp_to_idx:
        mapping = F.create_map(
            *[x for kv in fp_to_idx.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )[F.col("fp")]
    else:  # no valid rows at all -> no layers
        mapping = F.lit(None).cast("int")
    assigned = with_fp.withColumn("layer_idx", mapping).drop("fp")
    return assigned, layers


def _prop_value(name: str, ctype: str):
    # first-match lookup without an interpreted filter-lambda:
    # array_position returns the FIRST index of name (same semantics as
    # filter(...)[0]), and both expressions are codegen-native
    pos = F.array_position(F.col("props.name"), name)
    v = F.when(pos > 0, F.element_at(F.col("props.value"), pos.cast("int")))
    if ctype == "number":
        return v.cast("double")
    if ctype == "boolean":
        return v.cast("boolean")
    return v  # string / null / array-as-json -> string


def normalize_layer(assigned: DataFrame, layer: LayerSchema) -> DataFrame:
    """One layer's rows with final laundered column names and typed
    attribute columns (geometry kept as the flat struct under
    the_geom)."""
    names = layer.out_names
    cols = [F.col("doc_id"), F.col("span_offset"), F.col("geom").alias(names[0])]
    for out_name, (raw, ctype) in zip(names[1:], layer.columns):
        cols.append(_prop_value(raw, ctype).alias(out_name))
    return assigned.filter(F.col("layer_idx") == layer.layer_idx).select(*cols)


def layer_summary(assigned: DataFrame, layers: list[LayerSchema]) -> list[dict]:
    """Reference summary service output per layer (services/summary.js
    :10-93): count, geom type, projection, bbox (pre-reprojection
    coordinates)."""
    counts = {
        r["layer_idx"]: r
        for r in assigned.groupBy("layer_idx")
        .agg(
            F.count("*").alias("n"),
            F.min(F.array_min("geom.xs")).alias("minx"),
            F.min(F.array_min("geom.ys")).alias("miny"),
            F.max(F.array_max("geom.xs")).alias("maxx"),
            F.max(F.array_max("geom.ys")).alias("maxy"),
        )
        .collect()
    }
    out = []
    for layer in layers:
        c = counts.get(layer.layer_idx)
        names = layer.out_names
        out.append(
            {
                "layer_idx": layer.layer_idx,
                "count": c["n"] if c else 0,
                # layer.js:106-107 toJSON carries the spec/positional name
                "name": layer.name,
                "uid": layer.uid,
                "projection": layer.crs,
                "geomType": layer.geom_type_name,
                "bbox": {
                    "minx": c["minx"] if c else None,
                    "miny": c["miny"] if c else None,
                    "maxx": c["maxx"] if c else None,
                    "maxy": c["maxy"] if c else None,
                },
                "columns": [
                    {"fieldName": names[0], "name": naming.GEOM_NAME,
                     "dataTypeName": layer.geom_type_name}
                ]
                + [
                    {"fieldName": out, "name": raw,
                     "dataTypeName": DATA_TYPE_NAME[ctype]}
                    for out, (raw, ctype) in zip(names[1:], layer.columns)
                ],
            }
        )
    return out
