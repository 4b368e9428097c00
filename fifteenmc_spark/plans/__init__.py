from . import graph_build, grid, query, reach, snap  # noqa: F401
