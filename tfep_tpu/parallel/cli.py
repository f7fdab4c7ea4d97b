"""Declarative CLI tool wrappers (the engine command layer).

A ``CLITool`` subclass declares its options with descriptors
(:class:`KeyValueOption`, :class:`AbsolutePathOption`, :class:`FlagOption`)
and converts to a sanitized ``subprocess`` argv. This is how file-based
engines (GROMACS ``gmx``, CPMD) are wrapped. Reference behavior:
/root/reference/tfep/utils/cli/tool.py:30-290.

Example
-------
>>> class MyGrep(CLITool):
...     EXECUTABLE_PATH = 'grep'
...     patterns_file_path = KeyValueOption('-f')
...     max_count = KeyValueOption('-m')
...     print_version = FlagOption('-v')
>>> MyGrep(print_version=True).to_subprocess()
['grep', '-v']
>>> MyGrep('input.txt', max_count=3).to_subprocess()
['grep', '-m', '3', 'input.txt']
"""

from __future__ import annotations

import abc
import inspect
import os

__all__ = ['CLITool', 'CLIOption', 'KeyValueOption', 'AbsolutePathOption',
           'FlagOption']


class CLIOption(abc.ABC):
    """Descriptor base class for CLI options."""

    def __init__(self, option_name: str):
        self.option_name = option_name

    def __set_name__(self, owner_type, name):
        self.public_name = name
        self.private_name = '_' + name

    def __get__(self, owner_instance, owner_type):
        if owner_instance is None:
            return self
        return getattr(owner_instance, self.private_name, None)

    def __set__(self, owner_instance, value):
        setattr(owner_instance, self.private_name, value)

    @abc.abstractmethod
    def to_subprocess(self, owner_instance):
        """Strings to append to the argv (e.g. ``['-o', 'file.txt']``)."""


class KeyValueOption(CLIOption):
    """``-key value`` option; the value is stringified."""

    def to_subprocess(self, owner_instance):
        value = getattr(owner_instance, self.private_name, None)
        if value is None:
            return []
        return [self.option_name, str(value)]


class AbsolutePathOption(KeyValueOption):
    """Path option resolved to an absolute path on assignment.

    Engines run in per-sample working directories; absolute paths keep the
    option valid after the launcher changes cwd.
    """

    def __set__(self, owner_instance, value):
        setattr(owner_instance, self.private_name, os.path.abspath(value))


class FlagOption(CLIOption):
    """Boolean flag; optionally emits a ``no``-prefixed form when False."""

    def __init__(self, option_name: str, prepend_to_false: str = None):
        super().__init__(option_name)
        self.prepend_to_false = prepend_to_false

    def __set__(self, owner_instance, value):
        if not isinstance(value, bool) and value is not None:
            raise ValueError(
                self.public_name + ' must be either a boolean or None')
        setattr(owner_instance, self.private_name, value)

    def to_subprocess(self, owner_instance):
        value = getattr(owner_instance, self.private_name, None)
        if value is None or (not value and self.prepend_to_false is None):
            return []
        if value is True:
            return [self.option_name]
        n_dashes = 2 if self.option_name.startswith('--') else 1
        return [self.option_name[:n_dashes] + self.prepend_to_false
                + self.option_name[n_dashes:]]


class CLITool:
    """Base class for declarative command wrappers.

    Set ``EXECUTABLE_PATH`` (class-level) or pass ``executable_path``;
    ``SUBPROGRAM`` inserts a subcommand (e.g. ``gmx mdrun``). Positional
    constructor args are appended verbatim after the options.
    """

    EXECUTABLE_PATH = None
    SUBPROGRAM = None

    def __init__(self, *args, executable_path=None, **kwargs):
        self.args = args
        self._executable_path = executable_path

        defined = self._get_defined_options()
        for k, v in kwargs.items():
            if k not in defined:
                raise AttributeError('Undefined CLI option ' + k)
            setattr(self, k, v)

    @property
    def executable_path(self):
        if self._executable_path is None:
            return self.EXECUTABLE_PATH
        return self._executable_path

    @executable_path.setter
    def executable_path(self, value):
        self._executable_path = value

    def to_subprocess(self):
        """argv list for the ``subprocess`` module."""
        cmd = [self.executable_path]
        if self.SUBPROGRAM is not None:
            cmd.append(self.SUBPROGRAM)
        for descriptor in self._get_defined_options().values():
            cmd.extend(descriptor.to_subprocess(self))
        cmd.extend(str(x) for x in self.args)
        return cmd

    @classmethod
    def _get_defined_options(cls):
        options = {}
        for name, descriptor in inspect.getmembers(
                cls, inspect.isdatadescriptor):
            if isinstance(descriptor, CLIOption):
                options[name] = descriptor
        return options
