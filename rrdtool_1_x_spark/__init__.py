"""rrdtool_1_x_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of oetiker/rrdtool-1.x.

This is NOT a port of the reference C engine. It re-expresses the reference's
data model (data sources, primary data points, consolidated archives) and its
query language (DEF / CDEF-RPN / VDEF / XPORT, see /root/reference/src/
rrd_rpncalc.c, rrd_graph.c) as idiomatic PySpark DataFrame plans that Catalyst
optimizes, partition-prunes and code-generates.

Layout
------
- ``catalog``     dataset descriptors (DS defs, RRA defs) — replaces the RRD
                  file header (reference: src/rrd_format.h).
- ``operators``   DST rate conversion, PDP normalization, CDP consolidation,
                  fetch/RRA selection, reduce, alignment, VDEF, Holt-Winters.
- ``rpn``         RPN (CDEF) → pyspark Column compiler
                  (reference: src/rrd_rpncalc.c).
- ``plans``       DEF/CDEF/VDEF/XPORT query graphs → DataFrame DAGs
                  (reference: src/rrd_graph.c gdes array).
- ``timeparse``   AT-style time parser (reference: src/rrd_parsetime.c).
- ``xport``       tabular export formatting (reference: src/rrd_xport.c).
- ``streaming``   Structured Streaming ingest ≙ rrdcached
                  (reference: src/rrd_daemon.c).
- ``datapipe``    large-scale training-data ops: dedup, similarity search,
                  text analysis, multimodal plumbing (beyond the reference).
- ``binding``     python-rrdtool–compatible module surface
                  (reference: bindings/python/rrdtoolmodule.c).
- ``cli`` / ``cgi`` / ``render``  the rrdtool/rrdcgi command surface and
                  the no-cairo PNG/SVG/EPS/PDF graph renderer.
"""

__version__ = "0.1.0"
