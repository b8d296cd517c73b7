"""Build/load façade (parity: /root/reference/src/spann/spann_builder.rs).

``build`` runs clustering -> posting lists -> centroid index -> save, with the
reference's balance cap default ``desired_cluster_size = round(0.18 * n)``
(spann_builder.rs:48-49) unless the config overrides it (the reference never
lets you — SURVEY.md section 5 "config").
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from spfresh_tpu.clustering.hierarchical import HierarchicalClustering
from spfresh_tpu.index.config import Config
from spfresh_tpu.index.spann import SpannIndex

log = logging.getLogger(__name__)


class SpannIndexBuilder:
    """Mirror of SpannIndexBuilder (spann_builder.rs:8-75)."""

    def __init__(self, config: Config | str):
        self.config = Config.from_file(config) if isinstance(config, str) else config
        self.config.validate()
        self.data: Optional[np.ndarray] = None

    def with_data(self, data) -> "SpannIndexBuilder":
        self.data = np.asarray(data, dtype=np.float32)
        if self.data.ndim != 2:
            raise ValueError(f"data must be 2-d, got shape {self.data.shape}")
        return self

    def build(self, dim: Optional[int] = None, save: bool = True) -> SpannIndex:
        """build::<N> (spann_builder.rs:25-64).  ``dim`` is an optional check
        standing in for the reference's const-generic N (dim check at
        spann_builder.rs:38-45)."""
        if self.data is None:
            raise ValueError("no data provided; call with_data() first")
        n, d = self.data.shape
        if dim is not None and dim != d:
            raise ValueError(f"data dimension {d} does not match requested dim {dim}")

        params = self.config.to_clustering_params()
        if params.desired_cluster_size is None:
            params.desired_cluster_size = max(1, int(round(0.18 * n)))
        log.info(
            "building SPANN index: n=%d d=%d k=%d cap=%d metric=%s",
            n, d, params.initial_k, params.desired_cluster_size, params.metric,
        )
        hc = HierarchicalClustering(params, self.data).fit()

        index = SpannIndex(self.config)
        # Hand the clustering phase's device-resident corpus to the index:
        # the first search view then packs entirely on-chip (no multi-GB
        # member-vector re-upload from the host).
        index.create_posting_lists(hc.clusters, self.data, corpus_dev=hc.data)
        # The device view (centroid index, build_kdtree parity) materializes
        # lazily on first search, in the layout the search engine needs —
        # eagerly building both CSR and slab views would double the upload.
        if save:
            index.save(self.config.output_path)
        return index

    def load(self, dim: Optional[int] = None) -> SpannIndex:
        """load::<N> (spann_builder.rs:66-75)."""
        index = SpannIndex.load(self.config.output_path, self.config)
        if dim is not None and index.dim != dim:
            raise ValueError(f"loaded index dim {index.dim} does not match requested dim {dim}")
        return index
