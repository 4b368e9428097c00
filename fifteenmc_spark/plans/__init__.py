from . import graph_build, grid, pipeline, poi, query, reach, snap  # noqa: F401
