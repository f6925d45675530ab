"""Graph representations (ref src/graph/representation/)."""

GRAPH_TYPES = {}


def _classes():
    from .dbg_succinct import DBGSuccinct
    from .hash_graph import DBGBitmapGraph, DBGHashGraph
    from .sshash_graph import DBGSSHashGraph
    return {
        "succinct": DBGSuccinct,
        "bitmap": DBGBitmapGraph,
        "hash": DBGHashGraph,
        "hashfast": DBGHashGraph,
        "hashstr": DBGHashGraph,
        "sshash": DBGSSHashGraph,
    }


class _LazyClasses(dict):
    def __missing__(self, key):
        self.update(_classes())
        return dict.__getitem__(self, key)


GRAPH_CLASSES = _LazyClasses()


def build_graph(representation: str, sequences, k: int, mode: str = "basic",
                **kwargs):
    """Factory over all graph representations (ref cli/config graph types)."""
    from .dbg_succinct import DBGSuccinct
    from .hash_graph import DBGBitmapGraph, DBGHashGraph
    from .sshash_graph import DBGSSHashGraph

    types = {
        "succinct": DBGSuccinct,
        "bitmap": DBGBitmapGraph,
        "hash": DBGHashGraph,
        "hashfast": DBGHashGraph,
        "hashstr": DBGHashGraph,
        "sshash": DBGSSHashGraph,
    }
    return types[representation].build(sequences, k, mode=mode, **kwargs)
