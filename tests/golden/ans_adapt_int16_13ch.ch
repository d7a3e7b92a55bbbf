{
  "algorithm": "ans",
  "ans_seg_log2": 16,
  "ans_table_mode": "segment",
  "chunk_bounds": [
    0,
    1000,
    2000,
    3000,
    4000
  ],
  "chunk_offsets": [
    0,
    9355,
    18710,
    23537,
    28825
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "int16",
  "n_channels": 13,
  "sample_rate": 1000.0,
  "sha1_compressed": "7745a5f387bf88aa16a8bdcb81b3af0ac165a7be",
  "sha1_uncompressed": "91b319ef9f39e67c35207e9a96077315a40cac12",
  "shape": [
    4000,
    13
  ],
  "transform_adapt": 2,
  "transform_adapt_grid": [
    [
      1,
      2
    ],
    [
      false,
      true
    ]
  ],
  "version": "2.0"
}