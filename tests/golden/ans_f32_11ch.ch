{
  "algorithm": "ans",
  "ans_seg_log2": 16,
  "ans_table_mode": "segment",
  "chunk_bounds": [
    0,
    600,
    1200,
    1800,
    2400,
    2500
  ],
  "chunk_offsets": [
    0,
    21299,
    42051,
    62077,
    82133,
    86504
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "float32",
  "float_bitcast": true,
  "n_channels": 11,
  "sample_rate": 600.0,
  "sha1_compressed": "830250842403c30c2a09111e50888af7bf88bbb6",
  "sha1_uncompressed": "02350fa63f5245c40bf761ab94634792656ad060",
  "shape": [
    2500,
    11
  ],
  "version": "2.0"
}