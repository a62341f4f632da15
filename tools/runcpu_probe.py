import jax, sys
jax.config.update('jax_platforms', 'cpu')
import runpy
path = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(path, run_name='__main__')
