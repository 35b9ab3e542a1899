"""Catkin python setup (reference: airbot_sim2real_sl/setup.py)."""

from distutils.core import setup

from catkin_pkg.python_setup import generate_distutils_setup

setup(**generate_distutils_setup(packages=[], package_dir={}))
