"""Ray Data stage builders: map_batches callables, actor-pool classes,
and groupby/shuffle compositions. Each stage takes and returns
``ray.data.Dataset``; none owns a Ray session."""
