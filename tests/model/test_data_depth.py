"""Data / coords / dims bookkeeping depth battery.

Ports the reference TestSetUpdateCoords + coord-collision + nested-coords
inventory (tests/model/test_core.py:850-1080, 2100-2126) to this framework's
static-shape retrace semantics: set_data dimensionality and resize rules,
set_dim coord-value guards, dim-definer tracking (RV-defined dims are
immutable; data-defined dims warn when resized through another variable),
add_named_variable validation, and coordinate/variable name collisions.
"""

import warnings

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.exceptions import ShapeError, ShapeWarning


class TestSetUpdateCoords:
    def test_shapeerror_from_set_data_dimensionality(self):
        with pm.Model() as pmodel:
            pm.Data("m", np.ones((3,)), dims="one")
        with pytest.raises(ValueError, match="must have 1 dimensions"):
            pmodel.set_data("m", np.ones((3, 4)))

    def test_resize_from_set_data_dim_with_coords(self):
        with pm.Model(coords={"dim_with_coords": [1, 2]}) as pmodel:
            pm.Data("m", [1, 2], dims=("dim_with_coords",))
            # same-size swap is fine
            pmodel.set_data("m", [3, 4])
            # resize with new coords is fine
            pmodel.set_data("m", [1, 2, 3], coords={"dim_with_coords": [1, 2, 3]})
            assert pmodel.dim_lengths["dim_with_coords"] == 3
            # resize WITHOUT new coords: the dim has coord values -> error
            with pytest.raises(ValueError, match="'m' variable already had 3"):
                pm.set_data({"m": [1, 2, 3, 4]})

    def test_resize_from_set_data_dim_without_coords(self):
        with pm.Model() as pmodel:
            pm.Data("m", [1, 2], dims=("dim_without_coords",))
            pmodel.set_data("m", [3, 4])
            pmodel.set_data("m", [1, 2, 3])
            assert pmodel.dim_lengths["dim_without_coords"] == 3

    def test_resize_from_set_dim(self):
        with pm.Model(coords={"mdim": ["A", "B"]}) as pmodel:
            pm.Normal("a", dims="mdim")
        assert tuple(pmodel.coords["mdim"]) == ("A", "B")
        with pytest.raises(ValueError, match="has coord values"):
            pmodel.set_dim("mdim", new_length=3)
        with pytest.raises(ShapeError, match="does not match"):
            pmodel.set_dim("mdim", new_length=3, coord_values=["A", "B"])
        pmodel.set_dim("mdim", 3, ["A", "B", "C"])
        assert tuple(pmodel.coords["mdim"]) == ("A", "B", "C")

    def test_set_data_coords_length_mismatch(self):
        with pm.Model() as pmodel:
            pmodel.add_coord("mdim", ["A", "B"])
            pm.Data("mdata", [1, 2], dims="mdim")
        with pytest.raises(ShapeError, match="new coordinate values"):
            pmodel.set_data("mdata", [1, 2], coords={"mdim": [1, 2, 3]})

    def test_set_data_indirect_resize_with_coords(self):
        with pm.Model() as pmodel:
            pmodel.add_coord("mdim", ["A", "B"])
            pm.Data("mdata", [1, 2], dims="mdim")
        pmodel.set_dim("mdim", 3, ["A", "B", "C"])
        assert tuple(pmodel.coords["mdim"]) == ("A", "B", "C")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pmodel.set_data("mdata", [1, 2, 3])
        pmodel.set_data("mdata", [1, 2, 3, 4],
                        coords={"mdim": ["A", "B", "C", "D"]})
        assert tuple(pmodel.coords["mdim"]) == ("A", "B", "C", "D")

    def test_set_data_warns_on_resize_of_dims_defined_by_other_data(self):
        with pm.Model() as pmodel:
            pm.Data("m1", [1, 2], dims="mutable")
            pm.Data("m2", [3, 4], dims="mutable")
        with pytest.warns(ShapeWarning, match="another"):
            pmodel.set_data("m2", [4, 5, 6])
        pmodel.set_data("m1", [1, 2, 3])
        # resizing the DEFINING variable first is silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pmodel.set_data("m1", [1, 2])
            pmodel.set_data("m2", [3, 4])

    def test_rv_defined_dim_resize_raises(self):
        """RV shapes are static under XLA: a dim created from an RV's shape
        cannot be resized through a Data container."""
        with pm.Model() as pmodel:
            pm.Normal("x", size=7, dims="weekday")
            pm.Data("y", np.arange(7), dims="weekday")
        with pytest.raises(ShapeError, match="initialized from 'x'"):
            pmodel.set_data("y", np.arange(10))

    def test_none_coords_autonumbering(self):
        with pm.Model() as m:
            m.add_coord(name="a", values=None, length=3)
            m.add_coord(name="b", values=range(-5, 0))
            m.add_coord(name="c", values=None, length=7)
            pm.Normal("x", dims=("a", "b", "c"))
            idata = pm.sample_prior_predictive(draws=2, random_seed=1)
        prior = idata.prior
        assert prior["x"].shape == (1, 2, 3, 5, 7)
        b_coord = prior.coords["b"]
        b_vals = getattr(b_coord, "values", b_coord)
        assert list(np.asarray(b_vals)) == list(range(-5, 0))

    def test_add_named_variable_checks(self):
        with pm.Model() as pmodel:
            d = pm.Normal.dist(mu=np.array([1.0, 2.0]))
            from pymc_tpu.graph import FreeRV

            rv = FreeRV("nomnom", d, shape=(2,), dtype=d.dtype)
            with pytest.raises(ValueError, match="not specified in `coords`"):
                pmodel.add_named_variable(rv, dims="nomnom2")
            pmodel.add_coord("nomnom2", [1, 2])
            pmodel.add_named_variable(rv, dims=("nomnom2",))

    def test_add_named_variable_checks_number_of_dims(self):
        with pm.Model(coords={"bad": range(6)}) as m:
            d = pm.Normal.dist(mu=np.zeros((6, 6, 6)))
            from pymc_tpu.graph import FreeRV

            rv = FreeRV("a", d, shape=(6, 6, 6), dtype=d.dtype)
            with pytest.raises(ValueError, match="dim labels were provided"):
                m.add_named_variable(rv, dims=("bad",))
            with pytest.raises(ValueError, match="dim labels were provided"):
                m.add_named_variable(rv, dims="bad")

    def test_dims_type_check(self):
        with pm.Model(coords={"a": range(5)}) as m:
            d = pm.Normal.dist(mu=np.zeros((10, 5)))
            from pymc_tpu.graph import FreeRV

            rv = FreeRV("x", d, shape=(10, 5), dtype=d.dtype)
            with pytest.raises(TypeError, match="Dims must be string"):
                m.add_named_variable(rv, dims=(1, "a"))


class TestCoordVariableCollision:
    def test_variable_name_conflicts_with_existing_coord(self):
        with pm.Model(coords={"a": [0, 1]}):
            with pytest.raises(ValueError, match="conflicts with an existing dimension name"):
                pm.Data("a", [5, 10])
            with pytest.raises(ValueError, match="conflicts with an existing dimension name"):
                pm.Normal("a", dims="a")
            with pytest.raises(ValueError, match="conflicts with an existing dimension name"):
                pm.Deterministic("a", pm.math.constant(np.ones(2)))
            with pytest.raises(ValueError, match="conflicts with an existing dimension name"):
                pm.Potential("a", pm.math.constant(np.ones(2)))

    def test_add_coord_conflicts_with_existing_variable_name(self):
        with pm.Model() as m:
            pm.Data("a", [5, 10])
            with pytest.raises(ValueError, match="conflicts with an existing model variable name"):
                m.add_coord("a", [0, 1])


class TestNestedModelCoords:
    def test_nested_model_coords_shared(self):
        with pm.Model(name="m1", coords={"dim1": range(2)}) as m1:
            a = pm.Normal("a", dims="dim1")
            with pm.Model(name="m2", coords={"dim2": range(4)}) as m2:
                b = pm.Normal("b", dims="dim1")
                m1.add_coord("dim3", range(4))
                pm.HalfNormal("c", dims="dim3")
                pm.Normal("d", 0.0, 1.0, dims="dim2")
        assert m1.coords == m2.coords
        assert m1.dim_lengths == m2.dim_lengths
        assert "m1::a" in m1.named_vars_to_dims
        assert "m1::m2::b" in m1.named_vars_to_dims

    def test_multiple_add_coords_with_same_name(self):
        coord = {"dim1": ["a", "b", "c"]}
        with pm.Model(coords=coord) as m:
            a = pm.Normal("a", dims="dim1")
            with pm.Model(coords=coord):
                b = pm.Normal("b", dims="dim1")
            m.add_coords(coord)
            c = pm.Normal("c", dims="dim1")
            pm.Deterministic("d", a + b + c)
        assert m.dim_lengths["dim1"] == 3


class TestXarrayCoordUnwrap:
    @pytest.mark.parametrize(
        "coords_dict",
        [
            {"city": ["nyc", "la", "chi"]},
            {"year": [2020, 2021, 2022]},
        ],
        ids=["string", "int"],
    )
    def test_values_unwrapped_to_tuples(self, coords_dict):
        xr = pytest.importorskip("xarray")
        ds = xr.Dataset(coords=coords_dict)
        with pm.Model(coords=ds.coords) as m:
            key = next(iter(coords_dict))
            coord = m.coords[key]
            assert isinstance(coord, tuple)
            assert not isinstance(coord[0], xr.DataArray)
