PREFIX : <http://example/>
CLEAR ALL
