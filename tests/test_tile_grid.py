"""Round-4 multimodal planners: tile_grid (ViT-patch / crop-grid
explode) and aspect_bucket_waste (letterbox padding audit)."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _imgs():
    return pa.table(
        {
            "image_id": pa.array(["a", "b", "c", "d"]),
            "w": pa.array([10, 8, None, 0], pa.int32()),
            "h": pa.array([5, 8, 4, 4], pa.int32()),
        }
    )


def test_tile_grid_clipped_edges(ray_session):
    from schisma_ray.stages.multimodal import tile_grid

    out = (
        tile_grid(rd.from_arrow(_imgs()), tile=4)
        .to_pandas()
        .sort_values(["image_id", "tile_y", "tile_x"])
        .reset_index(drop=True)
    )
    # a: 10x5 at tile 4 -> 3x2 grid; b: 8x8 -> 2x2; c,d dropped
    assert out.image_id.tolist() == ["a"] * 6 + ["b"] * 4
    a = out[out.image_id == "a"]
    assert a[["tile_x", "tile_y"]].values.tolist() == [
        [0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]
    ]
    # edge clipping: last column is 2 wide, last row is 1 tall
    assert a.tw.tolist() == [4, 4, 2, 4, 4, 2]
    assert a.th.tolist() == [4, 4, 4, 1, 1, 1]
    assert a.x0.tolist() == [0, 4, 8, 0, 4, 8]
    b = out[out.image_id == "b"]
    assert b.tw.tolist() == [4] * 4 and b.th.tolist() == [4] * 4


def test_tile_grid_full_only_drops_partials(ray_session):
    from schisma_ray.stages.multimodal import tile_grid

    out = tile_grid(rd.from_arrow(_imgs()), tile=4, full_only=True).to_pandas()
    # a: floor(10/4) x floor(5/4) = 2x1; b: 2x2
    assert sorted(out.image_id.tolist()) == ["a", "a", "b", "b", "b", "b"]
    assert (out.tw == 4).all() and (out.th == 4).all()


def test_tile_grid_all_invalid_batch(ray_session):
    from schisma_ray.stages.multimodal import tile_grid

    t = pa.table(
        {
            "image_id": pa.array(["x"]),
            "w": pa.array([None], pa.int32()),
            "h": pa.array([3], pa.int32()),
        }
    )
    out = tile_grid(rd.from_arrow(t), tile=4)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "image_id", "tile_x", "tile_y", "x0", "y0", "tw", "th"
    }


def test_aspect_bucket_waste_known_values(ray_session):
    from schisma_ray.stages.multimodal import aspect_bucket_waste

    # one square image 20x20 -> bucket (24,24), fits scaled to 24x24,
    # waste 0; one 32x8 -> ar 4.0 -> bucket (32,16) (nearest 2.0),
    # width-bound: sw=32, sh=8*32//32=8 -> waste 32*16-32*8=256
    t = pa.table(
        {
            "image_id": pa.array(["s", "wide"]),
            "w": pa.array([20, 32], pa.int32()),
            "h": pa.array([20, 8], pa.int32()),
        }
    )
    out = aspect_bucket_waste(rd.from_arrow(t)).to_pandas()
    rows = {
        (r.bucket_w, r.bucket_h): (r.n_images, r.total_waste_px,
                                   r.max_waste_px)
        for r in out.itertuples()
    }
    assert rows[(24, 24)] == (1, 0, 0)
    assert rows[(32, 16)] == (1, 256, 256)
