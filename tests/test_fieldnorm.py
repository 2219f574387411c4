"""Fieldnorm table identity with the reference
(/root/reference/crates/tantivy/src/fieldnorm/code.rs)."""

import numpy as np

from cuely_spark.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id, id_to_fieldnorm


def test_table_spot_values():
    # spot-check against the reference's literal table (code.rs:13-270)
    assert FIELD_NORMS_TABLE[0] == 0
    assert FIELD_NORMS_TABLE[40] == 40
    assert FIELD_NORMS_TABLE[41] == 42
    assert FIELD_NORMS_TABLE[56] == 88
    assert FIELD_NORMS_TABLE[57] == 96
    assert FIELD_NORMS_TABLE[103] == 3864
    assert FIELD_NORMS_TABLE[104] == 4120
    assert FIELD_NORMS_TABLE[255] == 2_013_265_944
    assert len(FIELD_NORMS_TABLE) == 256
    assert (np.diff(FIELD_NORMS_TABLE) > 0).all()


def test_roundtrip_like_reference_test():
    # mirrors code.rs:277-293
    for i in range(41):
        assert fieldnorm_to_id([i])[0] == i
    assert fieldnorm_to_id([41])[0] == 40
    assert fieldnorm_to_id([42])[0] == 41
    for idx in range(43, 256):
        fn = int(FIELD_NORMS_TABLE[idx])
        assert id_to_fieldnorm([idx])[0] == fn
        assert fieldnorm_to_id([fn])[0] == idx
        assert fieldnorm_to_id([fn - 1])[0] == idx - 1
        assert fieldnorm_to_id([fn + 1])[0] == idx


def test_u32_max():
    assert fieldnorm_to_id([2**32 - 1])[0] == 255
