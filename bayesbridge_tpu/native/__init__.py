from . import sparsekit
