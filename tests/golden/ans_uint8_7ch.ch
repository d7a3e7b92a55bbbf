{
  "algorithm": "ans",
  "ans_seg_log2": 16,
  "chunk_bounds": [
    0,
    500,
    1000,
    1500,
    2000
  ],
  "chunk_offsets": [
    0,
    2738,
    5470,
    8220,
    10942
  ],
  "chunk_order": "F",
  "comp_level": -1,
  "do_spatial_diff": false,
  "do_time_diff": true,
  "dtype": "uint8",
  "n_channels": 7,
  "sample_rate": 500.0,
  "sha1_compressed": "e93a6ec131491fe63e59b1a18c3bbdfb456a9ef3",
  "sha1_uncompressed": "25c3578929a881113e5a43dcbbde7e8602645a6c",
  "shape": [
    2000,
    7
  ],
  "version": "2.0"
}