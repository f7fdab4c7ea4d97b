"""Molecular topology and a small atom-selection language.

MDAnalysis is not available in this environment, so the framework ships its
own host-side topology model plus a subset of the MDAnalysis selection
grammar (the reference accepts selection strings or index lists everywhere,
cf. /root/reference/tfep/app/base.py:906-944). Supported selections:

    all, none, index 3 5 7, index 2:10, name CA CB, element C H,
    resname MOL, resid 1:5, mass 10 to 20, bynum 1:4 (1-based),
    not <sel>, <sel> and <sel>, <sel> or <sel>, parentheses.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = ['Topology', 'ELEMENT_MASSES', 'guess_element']

# Standard atomic masses (amu) for common elements in biomolecular systems.
ELEMENT_MASSES: Dict[str, float] = {
    'H': 1.008, 'D': 2.014, 'He': 4.0026, 'Li': 6.94, 'Be': 9.0122,
    'B': 10.81, 'C': 12.011, 'N': 14.007, 'O': 15.999, 'F': 18.998,
    'Ne': 20.180, 'Na': 22.990, 'Mg': 24.305, 'Al': 26.982, 'Si': 28.085,
    'P': 30.974, 'S': 32.06, 'Cl': 35.45, 'Ar': 39.948, 'K': 39.098,
    'Ca': 40.078, 'Ti': 47.867, 'Cr': 51.996, 'Mn': 54.938, 'Fe': 55.845,
    'Co': 58.933, 'Ni': 58.693, 'Cu': 63.546, 'Zn': 65.38, 'Se': 78.971,
    'Br': 79.904, 'Kr': 83.798, 'Rb': 85.468, 'Sr': 87.62, 'Mo': 95.95,
    'Pd': 106.42, 'Ag': 107.87, 'Cd': 112.41, 'I': 126.90, 'Xe': 131.29,
    'Cs': 132.91, 'Ba': 137.33, 'Pt': 195.08, 'Au': 196.97, 'Hg': 200.59,
    'Pb': 207.2,
}

_TWO_LETTER = {k.upper(): k for k in ELEMENT_MASSES if len(k) == 2}


def guess_element(atom_name: str) -> str:
    """Guess the chemical element from an atom name (PDB conventions).

    Leading digits are stripped (``1HB2`` is hydrogen). A two-letter
    element symbol is recognized only on an exact capitalization match
    (``Cl``, ``Na``) so that all-caps alpha carbons (``CA``) are not
    mistaken for calcium — the same disambiguation rule MDAnalysis applies
    for the reference. Falls back to the first alphabetic character, and
    to carbon if the name has none.

    Parameters
    ----------
    atom_name : str
        Atom name as found in a PDB/GRO/prmtop file.

    Returns
    -------
    str
        Capitalized element symbol (e.g. ``'C'``, ``'Cl'``).
    """
    name = atom_name.strip().lstrip('0123456789')
    # Prefer a two-letter element only on exact capitalization match
    # ('Cl', 'Na', ...) so 'CA' (alpha carbon) is not read as calcium.
    if name[:2] in ELEMENT_MASSES:
        return name[:2]
    for ch in name:
        if ch.isalpha():
            return ch.upper()
    return 'C'


class Topology:
    """Host-side per-atom attributes plus bonds.

    This is the framework's replacement for the slice of the MDAnalysis
    ``Universe`` the reference actually consumes (atom names, elements,
    residues, masses, bonds, and the selection language;
    /root/reference/tfep/io/dataset/traj.py:43-120). It is a plain numpy
    container — nothing here is traced or device-resident; topology
    information is consumed at map-construction time only (e.g. to build
    the Z-matrix in :class:`tfep_tpu.app.mixedmaf.MixedMAFMap`).

    Missing attributes are derived: elements from atom names via
    :func:`guess_element`, masses from elements via :data:`ELEMENT_MASSES`,
    residue names/ids default to a single ``UNK`` residue.

    Parameters
    ----------
    names : sequence of str
        Atom names, length ``n_atoms``.
    elements : sequence of str, optional
        Element symbols; guessed from ``names`` if omitted.
    resnames : sequence of str, optional
        Per-atom residue names.
    resids : sequence of int, optional
        Per-atom residue ids.
    masses : sequence of float, optional
        Atomic masses in amu; looked up from elements if omitted.
    bonds : sequence of (int, int), optional
        Zero-based atom-index pairs.
    """

    def __init__(self, names: Sequence[str],
                 elements: Optional[Sequence[str]] = None,
                 resnames: Optional[Sequence[str]] = None,
                 resids: Optional[Sequence[int]] = None,
                 masses: Optional[Sequence[float]] = None,
                 bonds: Optional[Sequence] = None):
        self.names = np.asarray(names, dtype=object)
        n = len(self.names)
        if elements is None:
            elements = [guess_element(x) for x in self.names]
        self.elements = np.asarray(
            [str(e).capitalize() for e in elements], dtype=object)
        self.resnames = (np.asarray(resnames, dtype=object) if resnames
                         is not None else np.full(n, 'UNK', dtype=object))
        self.resids = (np.asarray(resids, dtype=np.int64) if resids
                       is not None else np.ones(n, dtype=np.int64))
        if masses is None:
            masses = [ELEMENT_MASSES.get(e, 0.0) for e in self.elements]
        self.masses = np.asarray(masses, dtype=np.float64)
        self.bonds = (np.asarray(bonds, dtype=np.int64).reshape(-1, 2)
                      if bonds is not None and len(bonds) else
                      np.zeros((0, 2), dtype=np.int64))

    @property
    def n_atoms(self) -> int:
        return len(self.names)

    # ------------------------------------------------------------------ #
    def select_atoms(self, selection) -> np.ndarray:
        """Resolve a selection to sorted atom indices.

        Parameters
        ----------
        selection : str or sequence of int or None
            Either a selection string in the mini-grammar documented in the
            module docstring (e.g. ``'resname MOL and not element H'``),
            an explicit index array (returned sorted), or ``None`` for an
            empty selection.

        Returns
        -------
        numpy.ndarray
            Sorted, zero-based atom indices, shape ``(n_selected,)``.

        Raises
        ------
        ValueError
            If the selection string cannot be parsed.
        """
        if selection is None:
            return np.zeros(0, dtype=np.int64)
        if not isinstance(selection, str):
            return np.sort(np.asarray(selection, dtype=np.int64).reshape(-1))
        mask = _SelectionParser(self).parse(selection)
        return np.nonzero(mask)[0].astype(np.int64)


class _SelectionParser:
    """Recursive-descent parser for the mini selection grammar."""

    _KEYWORDS = {'and', 'or', 'not', '(', ')', 'all', 'none', 'index',
                 'bynum', 'name', 'element', 'type', 'resname', 'resid',
                 'mass'}

    def __init__(self, topology: Topology):
        self.top = topology

    def parse(self, text: str) -> np.ndarray:
        self.tokens = re.findall(r'\(|\)|[^\s()]+', text)
        self.pos = 0
        mask = self._parse_or()
        if self.pos != len(self.tokens):
            raise ValueError(f'Could not parse selection: {text!r} '
                             f'(stuck at token {self.tokens[self.pos]!r})')
        return mask

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def _parse_or(self):
        mask = self._parse_and()
        while self._peek() == 'or':
            self._next()
            mask = mask | self._parse_and()
        return mask

    def _parse_and(self):
        mask = self._parse_unary()
        while self._peek() == 'and':
            self._next()
            mask = mask & self._parse_unary()
        return mask

    def _parse_unary(self):
        tok = self._peek()
        if tok == 'not':
            self._next()
            return ~self._parse_unary()
        if tok == '(':
            self._next()
            mask = self._parse_or()
            if self._next() != ')':
                raise ValueError('Unbalanced parentheses in selection.')
            return mask
        return self._parse_primary()

    def _values(self) -> List[str]:
        vals = []
        while (self._peek() is not None
               and self._peek() not in self._KEYWORDS):
            vals.append(self._next())
        if not vals:
            raise ValueError('Selection keyword requires at least one value.')
        return vals

    def _index_mask(self, vals, offset=0):
        n = self.top.n_atoms
        mask = np.zeros(n, dtype=bool)
        for v in vals:
            if ':' in v or '-' in v and not v.lstrip('-').isdigit():
                sep = ':' if ':' in v else '-'
                lo, hi = v.split(sep)
                lo, hi = int(lo) - offset, int(hi) - offset
                mask[lo:hi + 1] = True
            else:
                mask[int(v) - offset] = True
        return mask

    def _parse_primary(self):
        tok = self._next()
        n = self.top.n_atoms
        if tok == 'all':
            return np.ones(n, dtype=bool)
        if tok == 'none':
            return np.zeros(n, dtype=bool)
        if tok == 'index':
            return self._index_mask(self._values(), offset=0)
        if tok == 'bynum':
            return self._index_mask(self._values(), offset=1)
        if tok in ('name',):
            vals = set(self._values())
            return np.asarray([x in vals for x in self.top.names])
        if tok in ('element', 'type'):
            vals = {v.capitalize() for v in self._values()}
            return np.asarray([x in vals for x in self.top.elements])
        if tok == 'resname':
            vals = set(self._values())
            return np.asarray([x in vals for x in self.top.resnames])
        if tok == 'resid':
            mask = np.zeros(n, dtype=bool)
            for v in self._values():
                if ':' in v:
                    lo, hi = map(int, v.split(':'))
                    mask |= (self.top.resids >= lo) & (self.top.resids <= hi)
                else:
                    mask |= self.top.resids == int(v)
            return mask
        if tok == 'mass':
            vals = self._values()
            if len(vals) == 3 and vals[1] == 'to':
                lo, hi = float(vals[0]), float(vals[2])
                return (self.top.masses >= lo) & (self.top.masses <= hi)
            sel = np.zeros(n, dtype=bool)
            for v in vals:
                sel |= np.isclose(self.top.masses, float(v))
            return sel
        raise ValueError(f'Unknown selection keyword: {tok!r}')
