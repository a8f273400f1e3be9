"""Multi-chip data-parallel mapping on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.parallel.mesh import ShardedAligner, make_mesh


def test_sharded_matches_single_device(small_index, small_reads):
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    cfg = AlignerConfig(k=20, batch_size=64, max_read_len=64, max_nodes=64,
                    distinct_cap=0)

    B, L = 64, 64
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for j, (_, c) in enumerate(small_reads[:B]):
        codes[j, : len(c)] = c
        lens[j] = len(c)

    # single-device result
    from pseudoaligner_tpu.models.aligner import Pseudoaligner

    single = Pseudoaligner(small_index, cfg)
    res1 = single.map_batch_device(codes, lens)

    # 8-way sharded result
    mesh = make_mesh(8)
    sharded = ShardedAligner(small_index, cfg, mesh)
    res8, counts = sharded.map_batch(codes, lens)

    assert np.array_equal(np.asarray(res1.mapped), np.asarray(res8.mapped))
    assert np.array_equal(np.asarray(res1.coverage), np.asarray(res8.coverage))
    assert np.array_equal(np.asarray(res1.mismatches), np.asarray(res8.mismatches))
    assert np.array_equal(np.asarray(res1.ec_bits), np.asarray(res8.ec_bits))

    # psum'd transcript-compatibility counts match a host recomputation
    bits = np.asarray(res1.ec_bits)
    by = np.ascontiguousarray(bits).view(np.uint8)
    unpacked = np.unpackbits(by, axis=1, bitorder="little")[:, : small_index.n_tx]
    expect = unpacked.sum(axis=0).astype(np.int32)
    assert np.array_equal(np.asarray(counts), expect)


def test_mesh_sizes(small_index, small_reads):
    cfg = AlignerConfig(k=20, batch_size=32, max_read_len=64, max_nodes=64,
                    distinct_cap=0)
    B, L = 32, 64
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for j, (_, c) in enumerate(small_reads[:B]):
        codes[j, : len(c)] = c
        lens[j] = len(c)
    results = []
    for nd in (1, 2, 4):
        sharded = ShardedAligner(small_index, cfg, make_mesh(nd))
        res, counts = sharded.map_batch(codes, lens)
        results.append((np.asarray(res.coverage), np.asarray(counts)))
    for cov, cnt in results[1:]:
        assert np.array_equal(cov, results[0][0])
        assert np.array_equal(cnt, results[0][1])
