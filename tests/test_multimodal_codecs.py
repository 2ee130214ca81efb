

class TestVideoFrameSampling:
    @staticmethod
    def _ppm(px):
        h, w, _ = px.shape
        return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()

    def test_ppm_stream_real_decode(self, spark):
        import numpy as np
        from polars_net_spark.llm.multimodal import sample_video_frames

        f1 = np.zeros((4, 6, 3), np.uint8); f1[:, :3] = 255
        f2 = np.full((4, 6, 3), 128, np.uint8)
        f3 = np.zeros((4, 6, 3), np.uint8)
        video = self._ppm(f1) + self._ppm(f2) + self._ppm(f3)
        sdf = spark.createDataFrame(
            [(1, bytearray(video)), (2, None)], "media_id long, payload binary"
        )
        rows = sorted(
            (r["media_id"], r["frame_idx"], r["ts_ms"], r["height"], r["width"], len(r["thumb"]))
            for r in sample_video_frames(sdf, every=2, fps=25.0).spark.collect()
        )
        # every=2 keeps frames 0 and 2; null payload emits nothing
        assert rows == [(1, 0, 0, 4, 6, 8 * 8 * 3), (1, 2, 80, 4, 6, 8 * 8 * 3)]

    def test_split_and_resize_kernels(self, spark):
        import numpy as np
        from polars_net_spark.llm.media_codecs import resize_nearest, split_ppm_stream

        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        frames = split_ppm_stream(self._ppm(px) + self._ppm(px[::-1].copy()))
        assert len(frames) == 2 and (frames[0] == px).all()
        small = resize_nearest(px, 2, 3)
        assert small.shape == (2, 3, 3)
        assert (small[0, 0] == px[0, 0]).all()
        import pytest as _pt

        with _pt.raises(ValueError):
            split_ppm_stream(b"JUNK" + self._ppm(px))

    def test_compressed_still_raises(self, spark):
        from polars_net_spark.llm.multimodal import sample_video_frames

        sdf = spark.createDataFrame(
            [(3, bytearray(b"\x00\x00\x00 ftypisom___"))], "media_id long, payload binary"
        )
        import pytest as _pt

        with _pt.raises(Exception, match="ffmpeg|NotImplemented|compressed"):
            sample_video_frames(sdf).spark.collect()
