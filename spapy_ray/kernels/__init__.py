"""Pure-numpy geometry / indexing kernels. No Ray dependency.

These replace the C libraries the reference leans on (shapely/GEOS for
geometry — SpaVectors.py:14-15; GDAL/scipy for rasters —
SpaRasters.py:2-4), none of which exist in this environment.
"""
