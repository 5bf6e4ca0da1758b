"""DuckDB oracle SQL builders — facade.

Twin bodies live in spapy_ray/oracles/<domain>.py (same domains
as pipelines/q_*.py); this module re-exports every builder."""

from spapy_ray.oracles.common import *  # noqa: F401,F403
from spapy_ray.oracles.media import *  # noqa: F401,F403
from spapy_ray.oracles.graph import *  # noqa: F401,F403
from spapy_ray.oracles.raster import *  # noqa: F401,F403
from spapy_ray.oracles.text import *  # noqa: F401,F403
from spapy_ray.oracles.embed import *  # noqa: F401,F403
from spapy_ray.oracles.spatial import *  # noqa: F401,F403
from spapy_ray.oracles.relational import *  # noqa: F401,F403
