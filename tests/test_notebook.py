"""Execute the tutorial notebook (docs/intro_to_MTFEP.ipynb).

The notebook is the reference package's headline doc
(/root/reference/docs/intro_to_MTFEP.ipynb) re-done natively; it carries a
live assert (the multimap TFEP CI must bracket the quadrature-exact df), so
executing it here keeps the committed tutorial from rotting. Skipped when
notebook tooling is unavailable, or with TFEP_SKIP_EXAMPLE_TESTS=1.
"""

import os

import pytest

nbformat = pytest.importorskip('nbformat')
nbclient = pytest.importorskip('nbclient')

NOTEBOOK = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'intro_to_MTFEP.ipynb')


@pytest.mark.skipif(os.environ.get('TFEP_SKIP_EXAMPLE_TESTS') == '1',
                    reason='TFEP_SKIP_EXAMPLE_TESTS=1')
def test_tutorial_notebook_executes(tmp_path):
    nb = nbformat.read(NOTEBOOK, as_version=4)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_patch = (
        "import os, sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
    )
    nb.cells.insert(0, nbformat.v4.new_code_cell(env_patch))
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name='python3',
        resources={'metadata': {'path': str(tmp_path)}})
    client.execute()

    # The final assert cell ran (its success output is in the notebook).
    outputs = [
        out.get('text', '')
        for cell in nb.cells if cell.cell_type == 'code'
        for out in cell.get('outputs', []) if out.get('output_type') == 'stream'
    ]
    assert any('OK' in text and 'brackets' in text for text in outputs)
