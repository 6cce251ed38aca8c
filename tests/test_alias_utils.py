"""Tests for the alias-table and host sampling utilities (SURVEY.md §2.4),
mirroring the reference's statistical test style
(WalkerAliasTableTest.java chi-square vs multinomial,
SystematicSamplingTest.java)."""

import jax
import numpy as np
import pytest

from ldagroupedgibbssampler_tpu.ops.alias import (PoissonFixedCoeffSampler,
                                                  WalkerAliasTable,
                                                  build_alias_table)
from ldagroupedgibbssampler_tpu.utils.sampling import (
    index_sorter, sample_without_replacement, systematic_sample)


class TestAliasTable:
    def test_table_is_valid(self):
        rng = np.random.default_rng(0)
        p = rng.gamma(1.0, 1.0, 50)
        prob, alias = build_alias_table(p)
        assert prob.shape == (50,)
        assert np.all((prob >= 0) & (prob <= 1 + 1e-9))
        assert np.all((alias >= 0) & (alias < 50))

    def test_chi_square_against_target(self):
        # WalkerAliasTableTest style: draws match the target multinomial
        rng = np.random.default_rng(1)
        p = rng.gamma(1.0, 1.0, 20)
        p /= p.sum()
        table = WalkerAliasTable(p)
        n = 200_000
        draws = table.generate_sample(jax.random.key(2), (n,))
        counts = np.bincount(draws, minlength=20)
        expected = p * n
        chi2 = np.sum((counts - expected) ** 2 / expected)
        # 19 dof: 99.9th percentile ~ 43.8
        assert chi2 < 43.8, chi2

    def test_degenerate_distribution(self):
        table = WalkerAliasTable([0.0, 1.0, 0.0])
        draws = table.generate_sample(jax.random.key(0), (1000,))
        assert np.all(draws == 1)

    def test_poisson_fixed_coeff_moments(self):
        lam = 3.5
        sampler = PoissonFixedCoeffSampler(lam)
        draws = sampler.next_poisson(jax.random.key(3), (100_000,))
        assert np.mean(draws) == pytest.approx(lam, rel=0.02)
        assert np.var(draws) == pytest.approx(lam, rel=0.05)


class TestSamplingUtils:
    def test_systematic_proportional(self):
        w = np.asarray([100.0, 1.0, 1.0, 100.0, 1.0])
        rng = np.random.default_rng(0)
        hits = np.zeros(5)
        for _ in range(200):
            idx = systematic_sample(w, 2, rng)
            hits[idx] += 1
        # heavy items almost always included, light items rarely
        assert hits[0] > 180 and hits[3] > 180
        assert hits[1] + hits[2] + hits[4] < 40

    def test_without_replacement_distinct(self):
        idx = sample_without_replacement(100, 30,
                                         np.random.default_rng(1))
        assert len(np.unique(idx)) == 30

    def test_index_sorter_descending_stable(self):
        out = index_sorter([3, 9, 3, 1])
        np.testing.assert_array_equal(out, [1, 0, 2, 3])


class TestTee:
    def test_tee_console(self, tmp_path, capsys):
        from ldagroupedgibbssampler_tpu.utils.tee import tee_console
        p = tmp_path / "console.txt"
        with tee_console(str(p)):
            print("hello tee")
        assert "hello tee" in p.read_text()
        assert "hello tee" in capsys.readouterr().out
